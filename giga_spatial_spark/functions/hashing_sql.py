"""DuckDB oracle-SQL generators for the dedup/fingerprint operators.

Each function returns ANSI-ish SQL (DuckDB dialect: list comprehensions,
list_reduce, HUGEINT) that recomputes the *verified* output of the matching
Spark operator from the raw ``documents`` table, so the driver can
hash-compare the two engines.

Cross-engine parity notes (all verified on the synthetic corpus):
  - tokenization: ``regexp_extract_all(lower(text), '[a-z0-9]+')`` matches
    Python ``re.findall(r'[a-z0-9]+', text.lower())`` exactly for this
    corpus (pure ASCII — checked; non-ASCII lowercasing can diverge).
  - exact Jaccard is computed over shingle *strings* here vs shingle
    *64-bit hashes* in the Spark kernel — identical sets absent hash
    collisions (P < 1e-10 at these corpus sizes), and identical doubles
    because both divide the same exact integers.
  - the FNV-1a/rolling-hash oracles fold over code points; the Python
    kernels fold over UTF-8 bytes. Equal for ASCII corpora (asserted in
    tests); the kernels remain the general path.
"""

from __future__ import annotations

_FNV_OFFSET = 1469598103934665603
_FNV_PRIME = 1099511628211
_M64 = 1 << 64
_MERSENNE61 = (1 << 61) - 1

TOKS_CTE = (
    "toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') "
    "AS tok FROM documents)"
)


def shingle_jaccard_pairs_sql(k: int, threshold: float) -> str:
    """Exact k-token-shingle Jaccard pairs (a < b) with jaccard >= threshold.

    Mirrors hashing.shingle_hashes semantics: docs with fewer than k tokens
    are padded to exactly one shingle (pad marker '#', never a token char).
    """
    pad = ", ".join(["'#'"] * (k - 1))
    return f"""
WITH {TOKS_CTE},
padded AS (
  SELECT doc_id,
    CASE WHEN len(tok) >= {k} THEN tok
         ELSE list_concat(tok, [{pad}][1:greatest({k} - len(tok), 0)]) END AS tok
  FROM toks
),
sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
      unnest([array_to_string(tok[i : i + {k - 1}], ' ')
              for i in range(1, len(tok) - {k} + 2)]) AS s
    FROM padded
  )
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS i
  FROM sh sa JOIN sh sb ON sa.s = sb.s AND sa.doc_id < sb.doc_id
  GROUP BY 1, 2
),
j AS (
  SELECT inter.a, inter.b, inter.i / (na.n + nb.n - inter.i) AS jaccard
  FROM inter
  JOIN sizes na ON na.doc_id = inter.a
  JOIN sizes nb ON nb.doc_id = inter.b
)
SELECT a, b, jaccard FROM j WHERE jaccard >= {threshold!r}
"""


def _fnv_expr(tok: str) -> str:
    """HUGEINT FNV-1a of an ASCII token column, bit-exact with hashing._fnv
    (xor touches only the low 7 bits because code points < 128)."""
    return (
        "list_reduce("
        f"list_prepend({_FNV_OFFSET}::HUGEINT, "
        f"[ord(substr({tok}, i, 1))::HUGEINT for i in range(1, length({tok}) + 1)]), "
        "(h, c) -> ((h - (h % 128) + xor((h % 128)::BIGINT, c::BIGINT)::HUGEINT) "
        f"* {_FNV_PRIME}::HUGEINT) % {_M64}::HUGEINT)"
    )


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    """Brute-force SimHash pairs with hamming <= max_hamming — the exact
    semantics of the pigeonhole banded join (hamming < 4 implies a shared
    16-bit chunk, so the banded join loses nothing)."""
    # per-bit sign accumulators; Python masks to 63 bits (& (1<<63)-1),
    # so only bits 0..62 survive
    accs = []
    for j in range(63):
        src = f"(lo >> {j}) & 1" if j < 32 else f"(hi >> {j - 32}) & 1"
        accs.append(f"sum(CASE WHEN ({src}) = 1 THEN 1 ELSE -1 END) AS a{j}")
    acc_cols = ", ".join(accs)
    value = " + ".join(f"(CASE WHEN a{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(63))
    return f"""
WITH toke AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
vocab AS (SELECT DISTINCT tok FROM toke),
th AS (SELECT tok, {_fnv_expr('tok')} AS h FROM vocab),
tt AS (
  SELECT doc_id, (h % 4294967296)::BIGINT AS lo, (h // 4294967296)::BIGINT AS hi
  FROM toke JOIN th USING (tok)
),
acc AS (SELECT doc_id, {acc_cols} FROM tt GROUP BY doc_id),
sh AS (
  -- docs with zero tokens get all-NULL accumulators; NULL > 0 is false so
  -- every CASE yields 0 and s = 0, matching the Python kernel's empty-doc 0
  SELECT d.doc_id, {value} AS s
  FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN acc USING (doc_id)
)
SELECT sa.doc_id AS a, sb.doc_id AS b,
       cast(bit_count(xor(sa.s, sb.s)) AS INT) AS hamming
FROM sh sa JOIN sh sb ON sa.doc_id < sb.doc_id
WHERE bit_count(xor(sa.s, sb.s)) <= {max_hamming}
"""


def fingerprint_groups_sql(window: int = 16, base: int = 257, mod: int = _MERSENNE61) -> str:
    """Per-document min rolling polynomial hash over `window`-byte substrings
    (hashing.rolling_fingerprint), grouped into duplicate clusters.

    ASCII corpora only: folds code points where the kernel folds UTF-8 bytes.
    """
    pows = [pow(base, window - 1 - j, mod) for j in range(window)]
    terms = " + ".join(
        f"ord(substr(text, i + {j}, 1))::HUGEINT * {p}" for j, p in enumerate(pows)
    )
    return f"""
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
long_h AS (
  SELECT doc_id, unnest([({terms}) % {mod}::HUGEINT
                         for i in range(1, n - {window} + 2)]) AS h
  FROM d WHERE n > {window}
),
short_h AS (
  SELECT doc_id,
    list_reduce(
      list_prepend(0::HUGEINT,
        [ord(substr(text, i, 1))::HUGEINT for i in range(1, n + 1)]),
      (h, c) -> (h * {base} + c) % {mod}::HUGEINT) AS h
  FROM d WHERE n <= {window}
),
allh AS (SELECT * FROM long_h UNION ALL SELECT * FROM short_h),
f AS (SELECT doc_id, min(h)::BIGINT AS fingerprint FROM allh GROUP BY doc_id)
SELECT fingerprint, min(doc_id) AS survivor_id, count(*) AS n_docs
FROM f GROUP BY fingerprint
"""


# ------------------------------------------------------- UUID3 (MD5) twin
# Deterministic entity ids (entity.uuid3_id — reference
# entity_processor.py:1155-1161) are uuid3(NAMESPACE_DNS, key) = MD5 over
# namespace bytes + utf8(key) with version/variant bits patched. DuckDB's
# md5() only accepts VARCHAR and the namespace bytes are not valid UTF-8,
# so the oracle carries a from-scratch SINGLE-BLOCK MD5 in SQL: padded
# 64-byte message assembled per row (hex string surgery), 16 LE words,
# the 64 unrolled rounds as MATERIALIZED CTE steps (each step references
# its predecessors several times — without materialization DuckDB's CTE
# inlining expands ~4^64, the same planner cliff cell_center_sql hit).
# Valid for keys ≤ 39 utf8 bytes (16-byte namespace + key + 0x80 + length
# fit one block) — entity keys are short id tuples; longer keys raise via
# error() embedded in the generated SQL rather than mis-verifying.

_MD5_S = [
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21,
]
_MD5_K = [int(abs(__import__("math").sin(i + 1)) * 2**32) & 0xFFFFFFFF for i in range(64)]
_MASK32 = 0xFFFFFFFF


def _hexpair_sql(expr: str) -> str:
    """Two-hex-char VARCHAR expression → integer 0..255."""
    digit = (
        "(CASE {c} WHEN '0' THEN 0 WHEN '1' THEN 1 WHEN '2' THEN 2 "
        "WHEN '3' THEN 3 WHEN '4' THEN 4 WHEN '5' THEN 5 WHEN '6' THEN 6 "
        "WHEN '7' THEN 7 WHEN '8' THEN 8 WHEN '9' THEN 9 WHEN 'a' THEN 10 "
        "WHEN 'b' THEN 11 WHEN 'c' THEN 12 WHEN 'd' THEN 13 WHEN 'e' THEN 14 "
        "ELSE 15 END)"
    )
    hi = digit.format(c=f"substr({expr}, 1, 1)")
    lo = digit.format(c=f"substr({expr}, 2, 1)")
    return f"({hi} * 16 + {lo})"


def uuid3_sql(src: str, name_col: str = "name",
              ns_hex: str = "6ba7b8109dad11d180b400c04fd430c8") -> str:
    """SQL computing uuid3(namespace, {name_col}) for every row of ``src``
    → SELECT *, entity_id. Single-block MD5; see module comment."""
    rotl = lambda x, s: f"(((({x}) << {s}) | (({x}) >> {32 - s})) & {_MASK32})"  # noqa: E731
    # padded 64-byte message as a 128-char hex string; keys past the
    # single-block capacity fail LOUDLY (error()) instead of silently
    # producing a wrong digest — repeat('00', negative) would otherwise
    # collapse to '' and break the padding math with no signal
    ph = (
        f"CASE WHEN octet_length(encode({name_col})) > 39 THEN "
        "error('uuid3_sql: key exceeds 39 utf-8 bytes "
        "(single-block MD5 oracle limit)') ELSE "
        "lower("
        f"'{ns_hex}' || hex(encode({name_col})) || '80' || "
        f"repeat('00', 39 - octet_length(encode({name_col}))) || "
        f"lpad(to_hex(((16 + octet_length(encode({name_col}))) * 8) & 255), 2, '0') || "
        f"lpad(to_hex((((16 + octet_length(encode({name_col}))) * 8) >> 8) & 255), 2, '0') || "
        "'000000000000') END"
    )
    words = []
    for j in range(16):
        bytes_ = [
            _hexpair_sql(f"substr(ph, {2 * (4 * j + i) + 1}, 2)") for i in range(4)
        ]
        words.append(
            f"(({bytes_[0]})::UBIGINT + 256 * ({bytes_[1]})::UBIGINT "
            f"+ 65536 * ({bytes_[2]})::UBIGINT "
            f"+ 16777216 * ({bytes_[3]})::UBIGINT) AS w{j}"
        )
    steps = []
    for i in range(64):
        if i < 16:
            f_expr = "((b & c) | ((xor(b, {m})) & d))".format(m=_MASK32)
            g = i
        elif i < 32:
            f_expr = "((d & b) | ((xor(d, {m})) & c))".format(m=_MASK32)
            g = (5 * i + 1) % 16
        elif i < 48:
            f_expr = "xor(xor(b, c), d)"
            g = (3 * i + 5) % 16
        else:
            f_expr = "xor(c, (b | xor(d, {m})))".format(m=_MASK32)
            g = (7 * i) % 16
        tmp = f"((a + ({f_expr}) + {_MD5_K[i]} + w{g}) & {_MASK32})"
        prev = "mw" if i == 0 else f"s{i - 1}"
        steps.append(
            f"s{i} AS MATERIALIZED (SELECT * EXCLUDE (a, b, c, d), "
            f"d AS a, ((b + {rotl(tmp, _MD5_S[i])}) & {_MASK32}) AS b, "
            f"b AS c, c AS d FROM {prev})"
        )
    le_hex = (
        "lpad(to_hex(({x}) & 255), 2, '0') || "
        "lpad(to_hex((({x}) >> 8) & 255), 2, '0') || "
        "lpad(to_hex((({x}) >> 16) & 255), 2, '0') || "
        "lpad(to_hex((({x}) >> 24) & 255), 2, '0')"
    )
    digest = " || ".join(
        le_hex.format(x=f"(({init} + {v}) & {_MASK32})")
        for init, v in [
            (0x67452301, "a"), (0xEFCDAB89, "b"),
            (0x98BADCFE, "c"), (0x10325476, "d"),
        ]
    )
    variant = (
        "lower(to_hex((CASE substr(h, 17, 1) WHEN '0' THEN 0 WHEN '1' THEN 1 "
        "WHEN '2' THEN 2 WHEN '3' THEN 3 WHEN '4' THEN 4 WHEN '5' THEN 5 "
        "WHEN '6' THEN 6 WHEN '7' THEN 7 WHEN '8' THEN 8 WHEN '9' THEN 9 "
        "WHEN 'a' THEN 10 WHEN 'b' THEN 11 WHEN 'c' THEN 12 WHEN 'd' THEN 13 "
        "WHEN 'e' THEN 14 ELSE 15 END % 4) + 8))"
    )
    return (
        f"WITH m0 AS MATERIALIZED (SELECT *, {ph} AS ph FROM ({src})), "
        f"mw AS MATERIALIZED (SELECT * EXCLUDE (ph), {', '.join(words)}, "
        f"{0x67452301}::UBIGINT AS a, {0xEFCDAB89}::UBIGINT AS b, "
        f"{0x98BADCFE}::UBIGINT AS c, {0x10325476}::UBIGINT AS d FROM m0), "
        + ", ".join(steps)
        + f", dig AS (SELECT * EXCLUDE (a, b, c, d), lower({digest}) AS h FROM s63) "
        "SELECT * EXCLUDE (h" + "".join(f", w{j}" for j in range(16)) + "), "
        "concat(substr(h, 1, 8), '-', substr(h, 9, 4), '-', "
        "'3', substr(h, 14, 3), '-', "
        f"{variant}, substr(h, 18, 3), '-', substr(h, 21, 12)) AS entity_id "
        "FROM dig"
    )
