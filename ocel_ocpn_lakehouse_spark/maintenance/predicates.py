"""Conservative SQL-condition → manifest PrunePredicate derivation.

`delete_where` / `transform_where` take a free-form SQL predicate; at
10^12 rows their candidate-discovery scan should not touch files whose
footer bounds/Blooms already exclude every matching row. This parser
recognizes exactly the pruning-friendly shape — a conjunction of
``column op literal`` terms (op ∈ {=, ==, <, <=, >, >=, IN}) — and emits
the corresponding PrunePredicates. ANYTHING else (OR, NOT, !=, functions,
column-to-column comparison, reversed literal-first terms, subqueries)
fails the whole parse and derives NOTHING: pruning is an optimization
that must never change results, so the only safe failure mode is "scan
everything". Unknown/stat-less columns are also safe — ``entry_matches``
treats missing bounds as might-match.
"""

from __future__ import annotations

import re

from ..core.table import PrunePredicate

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
_NUM = r"-?\d+(?:\.\d+)?"
_STR = r"'(?:[^'\\]|\\.)*'"
_LIT = f"(?:{_NUM}|{_STR})"
_TERM = re.compile(
    rf"^\s*({_IDENT})\s*(==|=|<=|>=|<|>)\s*({_LIT})\s*$"
)
_IN_TERM = re.compile(
    rf"^\s*({_IDENT})\s+[Ii][Nn]\s*\(\s*({_LIT}(?:\s*,\s*{_LIT})*)\s*\)\s*$"
)
_AND_SPLIT = re.compile(r"\s+[Aa][Nn][Dd]\s+")
_LIT_SPLIT = re.compile(rf"{_LIT}")


def _parse_literal(tok: str):
    tok = tok.strip()
    if tok.startswith("'"):
        return tok[1:-1].replace("\\'", "'").replace("\\\\", "\\")
    return float(tok) if "." in tok else int(tok)


_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}
_FLOAT_TYPES = {"float", "double"}


def _literal_matches_type(value, simple_type: str) -> bool:
    """Strict literal/column type agreement — the Bloom probe hashes the
    PYTHON value, so ``w = 32.0`` against an int column (or ``h = 1``
    against a double) would hash a different representation than the one
    the file's filter was built from and falsely prune. Bounds on
    timestamps/dates are stored as isoformat strings while SQL literals
    use a space separator, so temporal (and every other exotic) column
    type derives nothing at all."""
    if simple_type in _INT_TYPES:
        return type(value) is int
    if simple_type in _FLOAT_TYPES:
        return type(value) is float
    if simple_type == "string":
        return type(value) is str
    return False


def derive_prune_predicates(condition: str, schema=None) -> list[PrunePredicate]:
    """PrunePredicates equivalent to ``condition`` when it is a pure
    conjunction of simple comparisons; [] otherwise (never partial — a
    half-parsed conjunction would still be sound, but refusing mixed
    shapes keeps the contract trivially auditable). ``schema`` (the
    table's StructType) gates every term on strict literal/column type
    agreement; without a schema nothing derives."""
    if not isinstance(condition, str) or schema is None:
        return []
    if re.search(r"\(\s*[Ss][Ee][Ll][Ee][Cc][Tt]\b", condition):
        return []
    types = {f.name: f.dataType.simpleString() for f in schema.fields}
    # a parenthesized boolean structure (OR groups etc.) fails _TERM
    # matching below; only IN-lists legitimately carry parentheses
    preds: list[PrunePredicate] = []
    for raw in _AND_SPLIT.split(condition):
        m = _TERM.match(raw)
        if m:
            col, op, lit = m.groups()
            val = _parse_literal(lit)
            if not _literal_matches_type(val, types.get(col, "")):
                return []
            preds.append(PrunePredicate(col, "=" if op == "==" else op, val))
            continue
        m = _IN_TERM.match(raw)
        if m:
            col, lits = m.groups()
            vals = [_parse_literal(x.group(0)) for x in _LIT_SPLIT.finditer(lits)]
            if not all(_literal_matches_type(v, types.get(col, "")) for v in vals):
                return []
            preds.append(PrunePredicate(col, "in", vals))
            continue
        return []  # any unrecognized term poisons the whole derivation
    return preds
