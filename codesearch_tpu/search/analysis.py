"""Query analysis helpers (behavioral parity with src/search/mod.rs:130-406):
identifier detection, structural intent, query expansion (≤9 variants),
adaptive RRF-k selection."""

from __future__ import annotations

from ..chunker import ChunkKind

_STOP_PASCAL = {"Find", "Show", "Get", "Where", "How", "What", "All"}


def detect_identifiers(query: str) -> list[str]:
    out = []
    for token in query.split():
        is_pascal = (
            token[:1].isupper()
            and any(c.islower() for c in token)
            and token not in _STOP_PASCAL
        )
        is_snake = "_" in token and all(c.isalnum() or c == "_" for c in token)
        is_camel = token[:1].islower() and any(c.isupper() for c in token)
        if is_pascal or is_snake or is_camel:
            out.append(token)
    return out


def contains_identifier(query: str) -> bool:
    chars = query
    n = len(chars)
    for i in range(n - 1):
        if chars[i].isupper() and (chars[i + 1].islower() or chars[i + 1].isdigit()):
            return True
    for i in range(1, n - 1):
        if chars[i] == "_" and chars[i - 1].islower() and chars[i + 1].islower():
            return True
    for i in range(n - 1):
        if chars[i].islower() and chars[i + 1].isupper():
            return True
    return False


_INTENT_KINDS = [
    ("class ", ChunkKind.CLASS),
    ("struct ", ChunkKind.STRUCT),
    ("function ", ChunkKind.FUNCTION),
    ("fn ", ChunkKind.FUNCTION),
    ("method ", ChunkKind.METHOD),
    ("enum ", ChunkKind.ENUM),
    ("interface ", ChunkKind.INTERFACE),
    ("trait ", ChunkKind.TRAIT),
]


def detect_structural_intent(query: str) -> ChunkKind | None:
    """Kind boost only when BOTH a structural keyword AND an identifier
    are present (prevents boosting ALL enums for the query 'enum')."""
    if not contains_identifier(query):
        return None
    low = query.lower()
    for kw, kind in _INTENT_KINDS:
        if kw in low:
            return kind
    return None


_ABBREVIATIONS = [
    ("auth", "authentication"),
    ("config", "configuration"),
    ("db", "database"),
    ("conn", "connection"),
    ("err", "error"),
    ("msg", "message"),
]

MAX_TOTAL_VARIANTS = 9


import re as _re

_PHRASE_RE = _re.compile(r'"([^"]+)"')


_EXCLUDE_RE = _re.compile(r'(?:^|\s)-(?:"([^"]+)"|([^\s"][^\s]*))')


def detect_phrases(query: str) -> list[str]:
    """Quoted spans are exact-phrase requirements (parity with tantivy's
    QueryParser phrase queries, fts/tantivy_store.rs:403-429). The index
    is position-free, so the constraint applies as a verbatim
    (case-insensitive) content filter at hit materialization: candidates
    retrieve by the phrase's terms as usual, results must contain each
    phrase. Excluded spans (-"...") are not requirements."""
    excluded = {m[0] for m in _EXCLUDE_RE.findall(query) if m[0]}
    return [m.strip() for m in _PHRASE_RE.findall(query)
            if m.strip() and m not in excluded]


def detect_exclusions(query: str) -> list[tuple[str, bool]]:
    """Leading-minus tokens are MustNot constraints (tantivy QueryParser
    parity): ``-word`` excludes results whose content contains the word
    as a token, ``-"a phrase"`` excludes verbatim phrase containment.
    Returns [(text, is_phrase)]. Filter-only approximation: the excluded
    term may still attract candidates during retrieval (the featurizers
    ignore operators), but no excluded result can surface."""
    out = []
    for phrase, word in _EXCLUDE_RE.findall(query):
        if phrase.strip():
            out.append((phrase.strip(), True))
        elif word:
            out.append((word, False))
    return out


def _excluded(content_folded: str, exclusions) -> bool:
    for text, is_phrase in exclusions:
        t = text.casefold()
        if is_phrase:
            if t in content_folded:
                return True
        elif _re.search(
            rf"(?<![a-z0-9_]){_re.escape(t)}(?![a-z0-9_])", content_folded
        ):
            return True
    return False


_QUESTION_WORDS = {"how", "where", "what", "why", "when", "which", "who"}
_QUESTION_FILLER = {
    "do", "does", "did", "we", "i", "you", "is", "are", "was", "were",
    "can", "could", "should", "would", "will", "to", "the", "a", "an",
    "in", "one", "our", "my",
}


def strip_question(query: str) -> str | None:
    """Interrogative scaffolding dilutes both retrieval legs: "how do we
    detect binary files" scores chunks containing "how"/"do"/"we" and
    spends half the hash-embedding mass on them. When the query starts
    with a question word, return the content core ("detect binary files");
    None otherwise. The core rides as an extra vector variant AND replaces
    the BM25 term selection (beyond the reference, whose labeled set shows
    exactly this weakness — benchmarks/improvement-plan.md Cat A)."""
    q = query.strip().rstrip("?").strip()
    toks = q.split()
    if len(toks) < 3 or toks[0].lower() not in _QUESTION_WORDS:
        return None
    i = 1
    while i < len(toks) and toks[i].lower() in _QUESTION_FILLER:
        i += 1
    core = " ".join(toks[i:])
    return core if core and core != q else None


def expand_query(query: str) -> list[str]:
    variants = [query]
    core = strip_question(query)
    if core is not None:
        variants.append(core)
    if len(query) < 4 or len(query) > 50:
        return variants
    looks_like_function = "_" in query and " " not in query
    looks_like_type = query[:1].isupper() and " " not in query
    if looks_like_function:
        variants += [f"fn {query}", f"async fn {query}", f"pub fn {query}",
                     f"{query} method", f"Function: {query}"]
    if looks_like_type:
        variants += [f"struct {query}", f"impl {query}", f"enum {query}",
                     f"class {query}", f"Struct: {query}"]
    is_single_concept = (
        "_" not in query and " " not in query and query[:1].islower()
    )
    if is_single_concept:
        variants += [f"fn {query}", f"{query} function"]
    abbrev_count = 0
    for abbr, full in _ABBREVIATIONS:
        if abbrev_count >= 2:
            break
        if abbr in query:
            expanded = query.replace(abbr, full)
            if expanded != query:
                variants.append(expanded)
                abbrev_count += 1
    return variants[:MAX_TOTAL_VARIANTS]


def adapt_rrf_k(query: str) -> tuple[float, float]:
    """(vector_k, fts_k) by query type (search/mod.rs:392-406)."""
    has_identifiers = bool(detect_identifiers(query))
    has_structural = detect_structural_intent(query) is not None
    if has_identifiers:
        return (12.0, 28.0)
    if has_structural:
        return (15.0, 25.0)
    return (20.0, 20.0)
