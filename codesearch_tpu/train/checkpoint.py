"""Training checkpoint/resume via orbax.

The retrieval index's checkpointing is the store snapshot + file manifest
(SURVEY.md §5); this module covers the *training* side: params + optimizer
state + step counter, saved atomically and restorable onto a mesh (orbax
handles sharded arrays natively).
"""

from __future__ import annotations

from pathlib import Path


def save_checkpoint(ckpt_dir: Path, step: int, params, opt_state) -> None:
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).resolve() / f"step_{step:08d}"
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, {"params": params, "opt_state": opt_state, "step": step})


def latest_step(ckpt_dir: Path) -> int | None:
    d = Path(ckpt_dir)
    if not d.exists():
        return None
    steps = sorted(
        int(p.name.removeprefix("step_"))
        for p in d.iterdir()
        if p.name.startswith("step_") and p.name.removeprefix("step_").isdigit()
    )
    return steps[-1] if steps else None


def restore_checkpoint(ckpt_dir: Path, step: int, template) -> dict:
    """Restore onto the template's shardings (template = {params, opt_state,
    step} pytree of like-shaped arrays, e.g. a fresh init)."""
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).resolve() / f"step_{step:08d}"
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path, item=template)
