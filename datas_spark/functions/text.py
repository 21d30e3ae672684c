"""Text scoring / analysis as native Column expressions.

Covers the reference's scorer family (SURVEY §2.2):
- length scores   — ``/root/reference/main_test_4_DataS.py:66-75`` (P1),
                    ``src/pipeline/score_pipeline/score_pipeline_lenth.py:35-38`` (P2)
- prompt templating — ``/root/reference/main.py:72-83,177-212`` (P3)

plus the north-star text-analysis extensions: token counting,
language-ID heuristic, quality scoring, document fingerprinting,
shingling and a portable 32-bit hash (md5-derived, reproducible in
DuckDB) used by MinHash/SimHash dedup.

Everything is a JVM-side expression — whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "length_score",
    "alpaca_prompt",
    "whole_text",
    "direct_answer_text",
    "tokenize",
    "token_count",
    "word_tokens",
    "stopword_ratio",
    "punct_ratio",
    "quality_score",
    "language_id",
    "fingerprint",
    "shingles",
    "hash32",
    "hash60",
    "hash56",
]

# --- reference prompt templates (main.py:72-83, PROMPT_DICT) -------------

PROMPT_INPUT = (
    "Below is an instruction that describes a task, paired with an input that "
    "provides further context. Write a response that appropriately completes "
    "the request.\n\n"
    "### Instruction:\n{instruction}\n\n### Input:\n{input}\n\n### Response:"
)
PROMPT_NO_INPUT = (
    "Below is an instruction that describes a task. Write a response that "
    "appropriately completes the request.\n\n"
    "### Instruction:\n{instruction}\n\n### Response:"
)

# A small multilingual stopword table for the language-ID heuristic.
# Heuristic only — real deployments would plug a model scorer here.
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "les", "des", "est"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht", "mit"],
}

def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def length_score(col: Column | str) -> Column:
    """P1/P2: character length, deliberately un-normalized (the reference
    defers normalization to a later stage — main_test_4_DataS.py:70)."""
    return F.length(_c(col))


def alpaca_prompt(instruction: Column | str, input_: Column | str) -> Column:
    """P3: alpaca prompt templating — empty ``input`` selects the no-input
    template (main.py:177-212 ``trans_temp2use``)."""
    ins, inp = _c(instruction), _c(input_)
    with_input = F.concat(
        F.lit(PROMPT_INPUT.split("{instruction}")[0]),
        ins,
        F.lit("\n\n### Input:\n"),
        inp,
        F.lit("\n\n### Response:"),
    )
    no_input = F.concat(
        F.lit(PROMPT_NO_INPUT.split("{instruction}")[0]),
        ins,
        F.lit("\n\n### Response:"),
    )
    return F.when(F.coalesce(inp, F.lit("")) == "", no_input).otherwise(with_input)


def whole_text(instruction: Column | str, input_: Column | str, output: Column | str) -> Column:
    """prompt + output (main.py:186,201)."""
    return F.concat(alpaca_prompt(instruction, input_), _c(output))


def direct_answer_text(output: Column | str) -> Column:
    """'### Response:' + output (main.py:187,202)."""
    return F.concat(F.lit("### Response:"), _c(output))


# --- tokenization / counting --------------------------------------------

def word_tokens(col: Column | str) -> Column:
    """Whitespace word tokens of trimmed text (array<string>)."""
    return F.split(F.trim(_c(col)), r"\s+")


def tokenize(col: Column | str) -> Column:
    """BPE-ish tokens: words plus split-off punctuation runs.

    Lowercases, then splits on word/punct boundaries so ``don't`` →
    ``don ' t`` — a deterministic approximation of byte-pair tokenizers
    good enough for token-budget accounting.
    """
    spaced = F.regexp_replace(F.lower(_c(col)), r"([^\w\s])", r" $1 ")
    return F.filter(F.split(F.trim(spaced), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))


# --- quality / language heuristics --------------------------------------

def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """fraction of whitespace tokens that are stopwords of ``lang``."""
    toks = word_tokens(col)
    # array_contains, not isin: isin inside a higher-order-function lambda
    # mis-coerces the literal list (Spark 4 analyzer limitation)
    stops_arr = F.array(*[F.lit(s) for s in _STOPWORDS[lang]])
    stop = F.filter(toks, lambda t: F.array_contains(stops_arr, F.lower(t)))
    return F.when(F.size(toks) > 0, F.size(stop) / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(col: Column | str) -> Column:
    c = _c(col)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: rewards moderate length, some
    stopwords, low punctuation density. Deterministic, SQL-expressible."""
    c = _c(col)
    len_term = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(c) * 4.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    return F.round((len_term + stop_term + punct_term) / 3.0, 6)


def language_id(col: Column | str) -> Column:
    """n-gram/stopword language guess over {en,es,fr,de}, 'und' if no hit.

    Picks the language whose stopword list matches the most tokens;
    ties break by fixed language order (en,es,fr,de) via greatest-first
    scan. Pure expression → same logic is written in SQL for the oracle.
    """
    toks = word_tokens(col)
    # NB: HOF lambdas must be single-parameter — PySpark's _create_lambda
    # passes a Column for every named parameter, defaults included.
    def _stop_pred(stops: list[str]):
        stops_arr = F.array(*[F.lit(s) for s in stops])
        return lambda t: F.array_contains(stops_arr, F.lower(t))

    counts = {
        lang: F.size(F.filter(toks, _stop_pred(stops)))
        for lang, stops in _STOPWORDS.items()
    }
    best = F.greatest(*counts.values())
    expr = F.lit("und")
    # build reversed so earlier langs win ties
    for lang in reversed(list(_STOPWORDS)):
        expr = F.when((best > 0) & (counts[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def normalized_text(col: Column | str) -> Column:
    """Dedup normalization: lowercase, strip punctuation, collapse
    whitespace."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(_c(col)), r"[^\w\s]", ""), r"\s+", " "
        )
    )


def fingerprint(col: Column | str) -> Column:
    """Normalized-content fingerprint: a portable 56-bit md5-derived
    integer of ``normalized_text`` (md5 so the oracle reproduces the
    VALUE bit-for-bit — this one is query output).
    Exact-dup keys at 100 TB: group/join on this, never on raw text."""
    return hash56(normalized_text(col))


# --- portable hashing (identical in DuckDB for oracle checks) ------------

def hash56(col: Column | str) -> Column:
    """First 14 hex chars of md5 as a bigint (56 bits, positive).

    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 14))::BIGINT``.
    Chosen over xxhash64/crc32 because md5 is the one hash both engines
    share bit-for-bit.
    """
    return F.conv(F.substring(F.md5(_c(col)), 1, 14), 16, 10).cast("long")


def hash32(col: Column | str) -> Column:
    """First 8 hex chars of md5 as a bigint (32 bits) — small enough that
    ``a*h + b`` stays in int64 for MinHash permutations."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 8), 16, 10).cast("long")


def hash60(col: Column | str) -> Column:
    """First 15 hex chars of md5 as a bigint (60 bits) — the widest
    md5-prefix hash that round-trips exactly through signed-int64 string
    conversion on every engine (16 hex chars can exceed 2^63, where
    ``conv``'s decimal string no longer casts to long). Token hash for
    wide SimHash signatures."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("long")


def shingles_of_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles from an already-materialized token ARRAY
    COLUMN (array<string>, distinct, order-insensitive).

    PERF: pass a bound column reference, not the ``word_tokens(...)``
    expression — subtrees referenced inside HOF lambdas are re-evaluated
    per element (no cross-lambda CSE), so an inline tokenizer makes
    shingling O(tokens × regex-split). Callers project tokens first.
    ``F.get`` (O(1) access) beats ``F.slice`` per-element copies.
    """
    cnt = F.size(toks) - (n - 1)
    # guard: Spark sequence(1, 0) counts DOWN ([1, 0]) — empty must be explicit
    grams = F.transform(
        F.sequence(F.lit(0), cnt - 1),
        lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(n)]),
    )
    return F.when(cnt >= 1, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def hashed_shingles_of_hashes(token_hashes: Column, n: int = 3) -> Column:
    """Word n-gram shingles as 64-bit hashes (array<bigint>, distinct),
    from an already-materialized array<bigint> of per-token hashes.

    For dedup paths where the shingle is only ever a join/grouping key,
    building the intermediate ``concat_ws`` STRING per gram (then
    dedup'ing and hashing strings) is pure overhead — hash each token
    once, then combine the n token hashes per position with one more
    ``xxhash64`` over longs. Same set cardinality as the string path
    modulo 64-bit collisions (~d²/2⁶⁵, negligible; already accepted for
    the downstream keys).

    PERF: pass a bound column reference (same rule as
    ``shingles_of_tokens`` — HOF lambda subtrees re-evaluate per
    element, so callers project the token-hash array first).
    """
    cnt = F.size(token_hashes) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(0), cnt - 1),
        lambda i: F.xxhash64(*[F.get(token_hashes, i + j) for j in range(n)]),
    )
    return F.when(cnt >= 1, F.array_distinct(grams)).otherwise(
        F.array().cast("array<bigint>")
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>, distinct, order-insensitive).

    Built from whitespace tokens: positions 1..len-n+1 each yield the
    space-joined n-gram. Used by MinHash and n-gram-Jaccard dedup.
    Prefer ``shingles_of_tokens`` over a projected token column in hot
    paths (see its PERF note).
    """
    return shingles_of_tokens(word_tokens(col), n)
