"""Extract the 10M product row from a bench.py run into product_10m.json.

Usage:
    BENCH_DB_DIR=/tmp/bench10m BENCH_ROWS=$((1<<20)) BENCH_INT8=1 \
        BENCH_PRODUCT_ROWS=10485760 BENCH_PRODUCT_BERT_ROWS=0 \
        BENCH_ENCODER=0 python bench.py > /tmp/bench10m.out
    python benchmarks/make_product_10m.py /tmp/bench10m.out

The driver's end-of-round bench runs the default 1M configuration; this
artifact is the VERDICT-r3-item-3 committed evidence for the 10M-chunk
int8 scale point (reference hybrid baseline: ~75 ms p50,
/root/reference/README.md:691).
"""
from __future__ import annotations

import json
import sys
from pathlib import Path


def main(path: str) -> None:
    row = None
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
    if row is None:
        raise SystemExit(f"no JSON line found in {path}")
    product = row["details"].get("product")
    if product is None:
        raise SystemExit(
            "bench row has no product details (BENCH_PRODUCT_ROWS=0?) — refusing "
            "to write an artifact that claims a 10M measurement it does not contain"
        )
    if int(product.get("rows", 0)) < 10_000_000:
        raise SystemExit(
            f"product row covers {product.get('rows')} rows, not a 10M config — "
            "rerun bench with BENCH_PRODUCT_ROWS=10485760"
        )
    if not product.get("int8", False):
        raise SystemExit("product row is not int8 — rerun bench with BENCH_INT8=1")
    out = {
        "config": "10M-chunk int8 product (hash model), single v5e-1 chip",
        "reference_hybrid_p50_ms": 75.0,
        "product": product,
        "kernel_row": {
            "metric": row["metric"],
            "value": row["value"],
            "unit": row["unit"],
        },
    }
    dest = Path(__file__).parent / "product_10m.json"
    dest.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {dest}")
    print(json.dumps(product, indent=2))


if __name__ == "__main__":
    main(sys.argv[1])
