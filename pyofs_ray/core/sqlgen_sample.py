"""DuckDB twin of the splitmix64 hash sampler (`stages/sample.py`).

HUGEINT is a *signed* INT128, so a full 64×64-bit product overflows; each
``* constant mod 2⁶⁴`` is decomposed into 32-bit limbs
(``a·b ≡ ((ah·bl + al·bh) mod 2³²)·2³² + al·bl``), every intermediate
< 2⁶⁵. The mix runs as a CTE chain, one finalizer step per stage, matching
`core.hashing.splitmix64` op-for-op.
"""

from __future__ import annotations

MOD64 = 1 << 64
MOD32 = 1 << 32
_GOLDEN = 0x9E3779B97F4A7C15
_C1 = 0xBF58476D1CE4E5B9
_C2 = 0x94D049BB133111EB


def _mulmod64(x: str, const: int) -> str:
    """(x * const) mod 2⁶⁴ via 32-bit limbs; ``x`` must be in [0, 2⁶⁴)."""
    bh, bl = const >> 32, const & (MOD32 - 1)
    return (f"((((({x}) // {MOD32}) * {bl} + (({x}) % {MOD32}) * {bh}) % {MOD32})"
            f" * {MOD32} + (({x}) % {MOD32}) * {bl}) % {MOD64}")


def to_u64(col: str) -> str:
    """int64 column → its uint64 bit pattern as HUGEINT."""
    return (f"(CASE WHEN {col} < 0 THEN CAST({col} AS HUGEINT) + {MOD64} "
            f"ELSE CAST({col} AS HUGEINT) END)")


_DEN = 1 << 20


def _quote(s: str) -> str:
    """Single-quoted SQL string literal, quotes doubled."""
    return "'" + s.replace("'", "''") + "'"


def _mix_ctes(table: str, key_col: str, salt: int, select: str,
              caller: str) -> str:
    """The shared splitmix64 CTE chain (q0→q2, final draw = xor(z2,
    z2 >> 31) % 2²⁰). ONE copy — every sampler twin composes this, so a
    fix to the mix lands everywhere at once."""
    if "*" in select:
        raise ValueError(
            f"{caller} needs an explicit column list: the CTE chain adds "
            "mix columns z0..z2 which '*' would leak into the result")
    key = to_u64(key_col)
    if salt:
        key = f"xor({key}, {salt})"
    return f"""
WITH q0 AS (SELECT {select}, (({key}) + {_GOLDEN}) % {MOD64} AS z0 FROM {table}),
q1 AS (SELECT *, {_mulmod64('xor(z0, z0 >> 30)', _C1)} AS z1 FROM q0),
q2 AS (SELECT *, {_mulmod64('xor(z1, z1 >> 27)', _C2)} AS z2 FROM q1)"""


def hash_sample_sql(table: str, key_col: str, rate: float, salt: int = 0,
                    select: str = "*") -> str:
    """Twin of `stages/sample.hash_sample`."""
    num = int(round(rate * _DEN))
    return f"""{_mix_ctes(table, key_col, salt, select, 'hash_sample_sql')}
SELECT {select} FROM q2 WHERE xor(z2, z2 >> 31) % {_DEN} < {num}
"""


def hash_split_sql(table: str, key_col: str, splits: dict[str, float],
                   salt: int = 0, select: str = "*",
                   out_col: str = "split") -> str:
    """Twin of `stages/sample.hash_split`: split label by half-open
    hash-bucket ranges in ``splits`` iteration order (bounds from rounded
    CUMULATIVE fractions, mirroring the stage)."""
    arms, cum = [], 0.0
    for name, frac in splits.items():
        cum += frac
        arms.append(f"WHEN h < {int(round(cum * _DEN))} THEN {_quote(name)}")
    if cum > 1 + 1e-9:  # mirror the stage's fractions-sum validation
        raise ValueError(f"hash_split_sql: fractions sum to {cum:.4f} > 1")
    # zero arms would be a CASE parser error; the remainder label is ''
    case = f"CASE {' '.join(arms)} ELSE '' END" if arms else "''"
    return f"""{_mix_ctes(table, key_col, salt, select, 'hash_split_sql')},
q3 AS (SELECT *, xor(z2, z2 >> 31) % {_DEN} AS h FROM q2)
SELECT {select}, {case} AS {out_col} FROM q3
"""


def stratified_sample_sql(table: str, key_col: str, stratum_col: str,
                          rates: dict[str, float], default_rate: float,
                          salt: int = 0, select: str = "*") -> str:
    """Twin of `stages/sample.stratified_hash_sample`: per-stratum
    threshold via a CASE lookup (NULL strata fall to the ELSE default,
    matching the stage's null handling)."""
    default_num = int(round(default_rate * _DEN))
    arms = " ".join(f"WHEN {_quote(s)} THEN {int(round(r * _DEN))}"
                    for s, r in rates.items())
    # zero arms would be a CASE parser error; all rows take the default
    thr = (f"CASE {stratum_col} {arms} ELSE {default_num} END"
           if arms else str(default_num))
    return f"""{_mix_ctes(table, key_col, salt, select,
                          'stratified_sample_sql')}
SELECT {select} FROM q2 WHERE xor(z2, z2 >> 31) % {_DEN} < {thr}
"""


def weighted_sample_sql(table: str, key_col: str, weight_col: str,
                        cap: int, per_unit: int, salt: int = 0,
                        select: str = "*") -> str:
    """Twin of `stages/sample.weighted_hash_sample`: per-row integer
    threshold ``LEAST(weight, cap) * per_unit`` against the same draw."""
    return f"""{_mix_ctes(table, key_col, salt, select,
                          'weighted_sample_sql')}
SELECT {select} FROM q2
WHERE xor(z2, z2 >> 31) % {_DEN}
      < LEAST({weight_col}, {cap}) * {per_unit}
"""
