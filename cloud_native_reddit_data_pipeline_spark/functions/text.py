"""Text column functions — all pure `pyspark.sql.functions` compositions
(JVM-side, whole-stage-codegen friendly; no Python UDFs in this module).

Re-expresses the reference's row-wise pandas `.apply(preprocess)` chain
(redditProcessor.py:36-53, applied at :95 — SURVEY.md O19/O20) as native
column expressions, which Catalyst folds into a single codegen stage and
which scale linearly with partitions instead of one Python process.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference strips this exact hand-picked stopword list with a
# word-boundary regex (redditProcessor.py:45-50).  "'ve" can never match:
# punctuation (including apostrophes) is stripped before stopword removal,
# so the pattern is dead by construction — kept verbatim because the
# reference carries the identical dead entry and parity means matching
# its observable behavior, dead patterns included.
REFERENCE_STOPWORDS = [
    "'ve", "ve", "this", "just", "like", "dont", "got", "really", "think",
    "know", "knew", "actually", "way", "yeah", "did", "im", "ive", "st",
    "want", "tho", "thats", "yes",
]

# string.punctuation, escaped for a Java/RE2 character class
# (redditProcessor.py:42 builds the same class from string.punctuation).
_PUNCT_CLASS = r"""[!"#$%&'()*+,\-./:;<=>?@\[\]^_`{|}~\\]"""

URL_RE = r"http\S+|www\S+|https\S+"  # redditProcessor.py:38-39
_WS_RE = r"\s+"


def _stopword_re(words: list[str]) -> str:
    # None of the reference's stopwords contain regex metacharacters other
    # than the apostrophe (not special in Java or DuckDB regex), so the
    # words are embedded as-is.
    return r"\b(?:" + "|".join(words) + r")\b"


STOPWORD_RE = _stopword_re(REFERENCE_STOPWORDS)


def normalize_text(col: Column | str) -> Column:
    """lowercase -> strip URLs -> strip punctuation -> drop stopwords ->
    collapse whitespace -> trim.  Exact semantics of preprocess()
    (redditProcessor.py:36-53), as one chained native expression."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    c = F.regexp_replace(c, URL_RE, "")
    c = F.regexp_replace(c, _PUNCT_CLASS, "")
    c = F.regexp_replace(c, STOPWORD_RE, "")
    c = F.regexp_replace(c, _WS_RE, " ")
    return F.trim(c)


def normalize_sql(expr: str) -> str:
    """The same chain as ANSI SQL text (used for DuckDB oracles)."""
    c = f"lower({expr})"
    c = f"regexp_replace({c}, '{URL_RE}', '', 'g')"
    punct = _PUNCT_CLASS.replace("'", "''")
    c = f"regexp_replace({c}, '{punct}', '', 'g')"
    stop = STOPWORD_RE.replace("'", "''")
    c = f"regexp_replace({c}, '{stop}', '', 'g')"
    c = f"regexp_replace({c}, '{_WS_RE}', ' ', 'g')"
    return f"trim({c})"


def concat_title_body(title: Column | str, body: Column | str) -> Column:
    """post text = title <> ' ' <> selftext (redditProcessor.py:81, O19)."""
    return F.concat_ws(" ", title, body)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization to array<string> (empty string -> empty array)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """n-word shingles as array<string> — input to MinHash / Jaccard dedup.

    Built by zip_with-ing the token array against its shifted slices:
    stays JVM-side, no explode needed when only the shingle set is
    wanted.  The shape matters: higher-order-function ARGUMENTS are
    evaluated once per row, but any non-lambda-variable subexpression
    in a lambda BODY re-evaluates per element — the previous
    sequence+transform form computed slice(tokens(col)) inside the
    lambda, re-running the regex tokenizer O(len) times per row
    (measured ~6x per-row cost on every shingle consumer in the 10x
    scale smoke).  Here tokens(col) appears only in argument position,
    so the tokenizer runs a constant ~2n times per row."""
    toks = tokens(col)
    acc = toks
    for k in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(
        F.size(toks) >= n,
        F.slice(acc, 1, F.size(toks) - (n - 1)),
    ).otherwise(F.array())


def fingerprint(col: Column | str) -> Column:
    """Key-collision fingerprint (OpenRefine-style): sorted distinct
    tokens of the normalized text, md5-hashed.  A deterministic document
    dedup key robust to word order and repetition."""
    toks = tokens(normalize_text(col))
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))


ROLLING_HASH_BASE = 31
ROLLING_HASH_MOD = 2147483647  # 2^31 - 1: a*31+x stays < 2^36, no overflow
ROLLING_HASH_SEED = 7


def rolling_hash(col: Column | str) -> Column:
    """Polynomial rolling hash of the full text: h = fold over chars of
    (h * 31 + ascii(c)) mod (2^31 - 1), seed 7 — the classic
    Rabin-Karp-style document fingerprint, exactly reproducible in any
    engine with integer folds (DuckDB oracle: list_reduce).  A narrow
    map: one pass over the characters, no shuffle.

    vs `fingerprint`: this is order-SENSITIVE (byte-stream identity),
    the token fingerprint is order-insensitive (content identity)."""
    chars = F.filter(F.split(F.col(col) if isinstance(col, str) else col, ""), lambda c: c != "")
    codes = F.transform(chars, lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(ROLLING_HASH_SEED).cast("long"),
        lambda acc, x: (acc * ROLLING_HASH_BASE + x) % ROLLING_HASH_MOD,
    )


# PII scrubbing — standard training-data hygiene (the reference has no
# redaction story; additive north-star surface).  Patterns are
# deliberately RE2-safe (no lookaround, \b + character classes only) so
# the EXACT same regex runs in Spark's Java engine and DuckDB's RE2 —
# the oracle replays the identical chain.  Order matters and is fixed:
# email first (may contain digits/dots), then SSN-shaped ids, then
# phones, then IPv4.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def scrub_pii(col: Column | str) -> Column:
    """Redact emails / SSN-shaped ids / phones / IPv4 addresses with
    typed placeholder tokens, in the fixed `PII_PATTERNS` order.  A
    narrow per-row map (chained codegen'd regexp_replace) — no shuffle,
    no Python; at 100 TB this rides the same scan as any other
    projection."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column | str) -> list[Column]:
    """One count column per PII class (aliased n_<class>), computed on
    the ORIGINAL text — audit metrics that ship with the scrub."""
    src = F.col(col) if isinstance(col, str) else col
    return [
        F.regexp_count(src, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


# The high-frequency UTF-8-read-as-Latin-1 double-encoding artifacts
# (the ftfy core table, restricted to sequences with no regex
# metachars and no control bytes so both engines can count and replace
# them as plain literals).  ORDER MATTERS ONLY across prefix overlaps;
# all entries here are mutually prefix-free.
MOJIBAKE_MAP: list[tuple[str, str]] = [
    ("â€™", "’"),  # a-circ euro tm   -> right single quote
    ("â€œ", "“"),  # a-circ euro oe   -> left double quote
    ("â€“", "–"),  # a-circ euro ndash-> en dash
    ("â€”", "—"),  # a-circ euro mdash-> em dash
    ("Ã©", "é"),  # A-tilde copyright -> e acute
    ("Ã¨", "è"),  # -> e grave
    ("Ã¯", "ï"),  # -> i diaeresis
    ("Ã¼", "ü"),  # -> u diaeresis
    ("Ã¶", "ö"),  # -> o diaeresis
    ("Ã¤", "ä"),  # -> a diaeresis
    ("Ã±", "ñ"),  # -> n tilde
    ("Ã§", "ç"),  # -> c cedilla
]


def repair_encoding(col: Column | str) -> Column:
    """Undo the most common UTF-8-as-Latin-1 mojibake (the ftfy-lite
    repair pass corpus ingestion runs before any tokenization): chained
    literal replacements, a narrow codegen'd per-row map — no shuffle,
    no Python, scan-bound at any corpus size."""
    out = F.col(col) if isinstance(col, str) else col
    for bad, good in MOJIBAKE_MAP:
        out = F.regexp_replace(out, F.lit(bad), F.lit(good))
    return out
