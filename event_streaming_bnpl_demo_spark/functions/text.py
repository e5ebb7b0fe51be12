"""Text primitives for the LLM-data pack: tokenization, shingling,
normalization, lightweight hashing. All pure SQL expressions (strings)
so the same logic is emitted for the Spark plan and the DuckDB oracle,
and everything stays inside whole-stage codegen.
"""

from __future__ import annotations

#: Tiny stopword lexicon used by quality scoring / lang-id heuristics.
STOPWORDS = ("the", "a", "and", "of", "to", "in")


def tokens_col(text: str = "text") -> str:
    """Whitespace tokenization (documents are single-space separated)."""
    return f"split({text}, ' ')"


def duckdb_tokens(text: str = "text") -> str:
    return f"string_split({text}, ' ')"


def shingles_col(tokens: str, dialect: str = "spark") -> str:
    """Word 3-gram shingles from a token array; degenerate docs
    (<3 tokens) contribute their whole text as one shingle.

    Spark arrays are 0-based, DuckDB lists 1-based — the two emitted
    texts differ only in indexing.
    """
    if dialect == "spark":
        return (
            f"CASE WHEN size({tokens}) < 3 THEN array(concat_ws(' ', {tokens})) "
            f"ELSE transform(sequence(0, size({tokens}) - 3), "
            f"i -> concat_ws(' ', element_at({tokens}, i + 1), "
            f"element_at({tokens}, i + 2), element_at({tokens}, i + 3))) END"
        )
    return (
        f"CASE WHEN len({tokens}) < 3 THEN [array_to_string({tokens}, ' ')] "
        f"ELSE list_transform(generate_series(1, len({tokens}) - 2), "
        f"i -> concat_ws(' ', {tokens}[i], {tokens}[i + 1], {tokens}[i + 2])) END"
    )


def normalize_text(text: str = "text", dialect: str = "spark") -> str:
    """Canonical form for fingerprinting: lowercase, every maximal run
    of non-alphanumerics (spaces included) collapses to one space,
    trim. ONE regex pass: this is exactly equivalent to the two-pass
    form (non-alnum-except-space -> ' ' per char, then collapse ' +')
    because both map each non-alnum run to a single space — but the
    fused pattern halves the regex work per text byte, the dominant
    per-row cost of the curation pipeline's scrub stage (sf1 warm p50
    4.8 -> 3.8 s, interleaved A/B)."""
    if dialect == "spark":
        return f"trim(regexp_replace(lower({text}), '[^a-z0-9]+', ' '))"
    return f"trim(regexp_replace(lower({text}), '[^a-z0-9]+', ' ', 'g'))"


def hexchar_parity(hash_expr: str, pos: int) -> str:
    """Bit ``pos`` of a cheap text hash: parity of the ``pos``-th hex
    char of md5. Pure string ops — identical in Spark and DuckDB
    (instr is 1-based in both)."""
    return (
        f"(instr('0123456789abcdef', substring({hash_expr}, {pos}, 1)) - 1) % 2"
    )
