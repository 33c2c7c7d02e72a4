"""String-similarity scalar functions used by the pairwise feature stage.

The reference computes these with third-party libs (``jellyfish``,
``pyjarowinkler``, ``editdistance`` — see
``/root/reference/namematch/comparison_functions.py:176-209``).  This engine
keeps the JVM-native versions where Spark has them (``F.levenshtein``,
``F.soundex``) and implements the rest here as pure-Python functions invoked
from Arrow-batched pandas UDFs (never per-row Python UDFs).

Jaro-Winkler follows the standard definition (boost threshold 0.7, max
prefix 4, scaling 0.1) so that results are verifiable against DuckDB's
``jaro_winkler_similarity`` oracle.  NYSIIS follows the original Taft (1970)
algorithm as publicly documented.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# Jaro / Jaro-Winkler
# ---------------------------------------------------------------------------

def jaro(s1: str, s2: str) -> float:
    """Jaro similarity in [0, 1]."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c1:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions: compare matched characters in order
    t = 0
    j = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    m = float(matches)
    return (m / len1 + m / len2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str, scaling: float = 0.1,
                 boost_threshold: float = 0.7, max_prefix: int = 4) -> float:
    """Standard Jaro-Winkler similarity (matches DuckDB's
    ``jaro_winkler_similarity`` for oracle verification)."""
    j = jaro(s1, s2)
    if j <= boost_threshold:
        return j
    prefix = 0
    for c1, c2 in zip(s1[:max_prefix], s2[:max_prefix]):
        if c1 != c2:
            break
        prefix += 1
    return j + prefix * scaling * (1.0 - j)


def _pyjw_matching_characters(first: str, second: str) -> str:
    """pyjarowinkler-variant matching pass: window limit is
    ``floor(min(len)/2)`` (standard Jaro uses ``floor(max/2)-1``) and a
    matched character is consumed at its FIRST unconsumed occurrence
    anywhere in ``second``, not the occurrence inside the window."""
    import math
    common: list[str] = []
    limit = math.floor(min(len(first), len(second)) / 2)
    for i, ch in enumerate(first):
        left, right = max(0, i - limit), min(i + limit + 1, len(second))
        if ch in second[left:right]:
            common.append(ch)
            j = second.index(ch)
            second = second[:j] + "*" + second[j + 1:]
    return "".join(common)


def jaro_winkler_pyjw(s1: str, s2: str, scaling: float = 0.1) -> float:
    """The ``pyjarowinkler.distance.get_jaro_distance`` variant the
    reference calls (``comparison_functions.py:206-209``), re-derived
    from that library's published algorithm for bit-parity with the
    reference's feature values.  Divergences from standard JW, all
    reproduced here: inputs lowercased for the Jaro score but the
    Winkler prefix read off the original strings; match window
    ``floor(min/2)``; first-anywhere match consumption; asymmetric
    two-pass matching (``m1`` from the shorter string drives both the
    match count and the transposition denominator); no 0.7 boost
    threshold; result rounded to 2 decimals (``round(x*100)/100``).

    Verified exact (328/328 values, tolerance 1e-12) against the
    reference's committed feature goldens
    (``tests/unit/data/data_rows.csv``) — see
    ``tests/test_jw_parity.py``.
    """
    import math
    shorter, longer = s1.lower(), s2.lower()
    if len(s1) > len(s2):
        longer, shorter = shorter, longer
    m1 = _pyjw_matching_characters(shorter, longer)
    m2 = _pyjw_matching_characters(longer, shorter)
    if not m1 or not m2:
        jaro = 0.0
    else:
        transposed = math.floor(
            sum(1 for f, s in zip(m1, m2) if f != s) / 2)
        jaro = (len(m1) / len(shorter) + len(m2) / len(longer)
                + (len(m1) - transposed) / len(m1)) / 3.0
    prefix = 0
    for c1, c2 in zip(s1, s2):
        if c1 != c2:
            break
        prefix += 1
    cl = min(prefix, 4)
    return round((jaro + scaling * cl * (1.0 - jaro)) * 100.0) / 100.0


#: jw_variant name -> similarity function used by jw_dist_series
JW_VARIANTS = {"standard": jaro_winkler, "pyjarowinkler": jaro_winkler_pyjw}


def jw_dist_series(a: pd.Series, b: pd.Series,
                   variant: str = "standard") -> pd.Series:
    """Vectorized (batch-level) 1 - JW over two string Series.

    Reference semantics: ``comparison_functions.py:206-209`` computes
    ``1 - get_jaro_distance(...)`` and NaN where either side missing.
    ``variant="standard"`` (default) matches DuckDB's
    ``jaro_winkler_similarity`` so the contract oracles can mirror it;
    ``variant="pyjarowinkler"`` reproduces the reference's library
    bit-for-bit (see :func:`jaro_winkler_pyjw`).
    """
    sim = JW_VARIANTS[variant]
    a_arr = a.to_numpy(dtype=object)
    b_arr = b.to_numpy(dtype=object)
    out = np.empty(len(a_arr), dtype=np.float64)
    for i in range(len(a_arr)):
        x, y = a_arr[i], b_arr[i]
        if not x or not y:
            out[i] = np.nan
        else:
            out[i] = 1.0 - sim(x, y)
    return pd.Series(out, index=a.index)


# ---------------------------------------------------------------------------
# NYSIIS (Taft 1970, classic variant — the one jellyfish implements)
# ---------------------------------------------------------------------------

_VOWELS = set("AEIOU")


def nysiis(name: str) -> str:
    """NYSIIS phonetic code of an uppercase alphabetic string.

    Mirrors the classic algorithm used by ``jellyfish.nysiis`` (reference
    call site ``comparison_functions.py:200-204``).
    """
    s = "".join(c for c in name.upper() if c.isalpha())
    if not s:
        return ""
    # initial-prefix substitutions
    for pre, rep in (("MAC", "MCC"), ("KN", "NN"), ("K", "C"),
                     ("PH", "FF"), ("PF", "FF"), ("SCH", "SSS")):
        if s.startswith(pre):
            s = rep + s[len(pre):]
            break
    # terminal-suffix substitutions
    for suf, rep in (("EE", "Y"), ("IE", "Y"), ("DT", "D"), ("RT", "D"),
                     ("RD", "D"), ("NT", "D"), ("ND", "D")):
        if s.endswith(suf):
            s = s[:-len(suf)] + rep
            break
    key = s[0]
    prev = s[0]
    i = 1
    n = len(s)
    while i < n:
        ch = s[i]
        seg = None
        if s[i:i + 2] == "EV":
            seg, step = "AF", 2
        elif ch in _VOWELS:
            seg, step = "A", 1
        elif ch == "Q":
            seg, step = "G", 1
        elif ch == "Z":
            seg, step = "S", 1
        elif ch == "M":
            seg, step = "N", 1
        elif s[i:i + 2] == "KN":
            seg, step = "N", 2
        elif ch == "K":
            seg, step = "C", 1
        elif s[i:i + 3] == "SCH":
            seg, step = "SSS", 3
        elif s[i:i + 2] == "PH":
            seg, step = "FF", 2
        elif ch == "H" and (prev not in _VOWELS or
                            (i + 1 < n and s[i + 1] not in _VOWELS)):
            seg, step = prev, 1
        elif ch == "W" and prev in _VOWELS:
            seg, step = prev, 1
        else:
            seg, step = ch, 1
        if seg and seg[-1] != key[-1]:
            key += seg
        prev = seg[-1] if seg else prev
        i += step
    # trailing cleanup
    if key.endswith("S") and len(key) > 1:
        key = key[:-1]
    if key.endswith("AY"):
        key = key[:-2] + "Y"
    if key.endswith("A") and len(key) > 1:
        key = key[:-1]
    return key


def nysiis_eq_series(a: pd.Series, b: pd.Series) -> pd.Series:
    """1.0 if NYSIIS codes equal, 0.0 if not, NaN if either side missing
    or contains digits (reference: ``comparison_functions.py:177,200-204``)."""
    out = np.empty(len(a), dtype=np.float64)
    a_arr = a.to_numpy(dtype=object)
    b_arr = b.to_numpy(dtype=object)
    for i in range(len(a_arr)):
        x, y = a_arr[i], b_arr[i]
        if (not x or not y or any(c.isdigit() for c in x)
                or any(c.isdigit() for c in y)):
            out[i] = np.nan
        else:
            out[i] = 1.0 if nysiis(x) == nysiis(y) else 0.0
    return pd.Series(out, index=a.index)


# ---------------------------------------------------------------------------
# Levenshtein (python fallback for driver-side / small-batch use; the
# distributed path uses JVM-native F.levenshtein)
# ---------------------------------------------------------------------------

def levenshtein(s1: str, s2: str) -> int:
    if s1 == s2:
        return 0
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, 1):
        cur = [i]
        for j, c2 in enumerate(s2, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (c1 != c2)))
        prev = cur
    return prev[-1]
