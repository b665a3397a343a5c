#!/usr/bin/env python3
"""Construct the Gopher boundary-fixture documents for q_gopher_full
(VERDICT r13 #7): documents engineered EXACTLY AT and just above each
repetition threshold the composed filter grades (top-3-gram 0.18,
top-2-gram 0.20, dup-5-gram 0.15, dup-line-char 0.20) plus the
stop-word rule at exactly 1 and 2 distinct hits — so the oracle diff
certifies the boundary semantics (<= keeps at the threshold), not just
the bulk corpus. This script VALIDATES every doc against a faithful
replica of both rule families (GopherRules structural battery,
RepetitionStats.compute, the stop-word count) and prints the docs as
data for the Scala fixture + SQL VALUES. Run it after editing; it
exits non-zero if any doc misses its target or trips a rule it should
not.
"""
import math
import re
import sys

STOP = ["the", "be", "to", "of", "and", "that", "have", "with"]


def r6(x):
    # BigDecimal HALF_UP at 6dp == floor(x*1e6 + 0.5)/1e6 for positives
    return math.floor(x * 1e6 + 0.5) / 1e6


def repetition(text):
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    n_lines = len(lines)
    from collections import Counter
    lc = Counter(lines)
    dup_line = 0.0 if n_lines == 0 else (n_lines - len(lc)) / n_lines
    tot_lc = sum(len(l) * c for l, c in lc.items())
    dup_lc = sum(len(l) * (c - 1) for l, c in lc.items() if c > 1)
    dup_line_char = 0.0 if tot_lc == 0 else dup_lc / tot_lc
    toks = [t for t in text.lower().split() if t]
    total_chars = 0 if not toks else sum(len(t) for t in toks) + len(toks) - 1

    def grams(n):
        return Counter(" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))

    def top_frac(n):
        if total_chars == 0:
            return 0.0
        m = grams(n)
        if not m:
            return 0.0
        mx = max(m.values())
        top = min(g for g, c in m.items() if c == mx)
        return mx * len(top) / total_chars

    def dup_frac(n):
        if total_chars == 0:
            return 0.0
        s = sum(c * len(g) for g, c in grams(n).items() if c > 1)
        return min(1.0, s / total_chars)

    return {k: r6(v) for k, v in dict(
        dup_line_frac=dup_line, dup_line_char_frac=dup_line_char,
        top2=top_frac(2), top3=top_frac(3), dup5=dup_frac(5)).items()}


def structural(text):
    words = [w for w in re.split(r"\s+", text) if w]
    n = len(words)
    lines = text.split("\n")
    n_lines = len(lines)
    mean_wl = 0.0 if n == 0 else sum(len(w) for w in words) / n
    n_hash = text.count("#")
    n_ell = text.count("...")
    sym = 0.0 if n == 0 else (n_hash + n_ell) / n
    bullet = sum(1 for l in lines if l.lstrip().startswith(("-", "*", "•")))
    ell_l = sum(1 for l in lines if l.rstrip().endswith(("...", "…")))
    alpha = 0.0 if n == 0 else sum(1 for w in words if re.search("[A-Za-z]", w)) / n
    dup = 0.0 if n_lines == 0 else (n_lines - len(set(lines))) / n_lines
    keep = (20 <= n <= 100000 and 3.0 <= mean_wl <= 10.0 and sym < 0.1 and
            (bullet / n_lines if n_lines else 0) < 0.9 and
            (ell_l / n_lines if n_lines else 0) < 0.3 and
            alpha > 0.80 and dup < 0.3)
    return n, mean_wl, keep


def hits(text):
    toks = set(t for t in text.lower().split() if t)
    return len(toks & set(STOP))


def rep_keep(r):
    return (r["dup_line_frac"] <= 0.30 and r["dup_line_char_frac"] <= 0.20 and
            r["top2"] <= 0.20 and r["top3"] <= 0.18 and r["dup5"] <= 0.15)


def filler(i, ln):
    """unique alphabetic token #i of exactly ln chars"""
    base = "wxyzqv"[i % 6] + f"{i:03d}"  # 4 chars, unique
    assert ln >= 4
    return base + "abcdefghij"[:ln - 4]


def total_chars(toks):
    return sum(len(t) for t in toks) + len(toks) - 1


def pad_to(toks, target, start=100):
    """append unique fillers until total_chars == target exactly"""
    i = start
    while total_chars(toks) < target - 30:
        toks.append(filler(i, 6))
        i += 1
    gap = target - total_chars(toks)  # remaining chars incl. separators
    if gap - 1 <= 14:                 # one token of len gap-1 (>= 4)
        assert gap - 1 >= 4, f"gap {gap}"
        toks.append(filler(i, gap - 1))
    else:                             # two tokens: (l1+1) + (l2+1) = gap
        l2 = max(4, gap - 2 - 14)
        l1 = gap - 2 - l2
        assert 4 <= l1 <= 14 and 4 <= l2 <= 14, f"gap {gap}"
        toks += [filler(i, l1), filler(i + 1, l2)]
    assert total_chars(toks) == target
    return toks


docs = {}

# --- top3 boundary: top 3-gram "foo bar baz" (len 11) ---------------
# ×9 scattered with unique separators; at: 99/550 = 0.18 exactly;
# over: 99/544 = 0.181985…
for name, tgt in [("top3_at", 550), ("top3_over", 544)]:
    toks = ["the", "and"]
    for k in range(9):
        toks += ["foo", "bar", "baz", filler(k, 5)]
    docs[name] = " ".join(pad_to(toks, tgt))

# --- top2 boundary: top 2-gram "foo bar" (len 7) --------------------
# ×10 scattered; at: 70/350 = 0.20 exactly; over: 70/345 = 0.202899…
for name, tgt in [("top2_at", 350), ("top2_over", 345)]:
    toks = ["the", "and"]
    for k in range(10):
        toks += ["foo", "bar", filler(k + 20, 5)]
    docs[name] = " ".join(pad_to(toks, tgt, start=200))

# --- dup5 boundary: dup 5-gram ×2, len 24 ---------------------------
# at: 48/320 = 0.15 exactly; over: 48/318 = 0.150943…
for name, tgt in [("dup5_at", 320), ("dup5_over", 318)]:
    g5 = ["aaaa", "bbbb", "cccc", "dddd", "eeee"]
    toks = ["the", "and"] + g5 + [filler(40, 5)] + g5
    docs[name] = " ".join(pad_to(toks, tgt, start=300))

# --- dup-line-char boundary: single-TOKEN line L (len 28) ×2 --------
# (a multi-token duplicated line would duplicate its own n-grams into
# top2/top3; a single token duplicates no gram — its neighbors differ)
# at: 28/140 = 0.20 exactly; over: 28/139 = 0.201439…
# "aa bb cc" planted once makes the lexicographic-min count-1 grams
# short, so the top-gram fracs stay far under their thresholds.
L = "copyrightfooterallrightskept"
assert len(L) == 28 and " " not in L
o1 = "the aa bb cc and"                       # 16 chars, 5 words
o2 = "mno pqr stu vwx yzz klm nop qrs tuv"    # 35 chars, 9 words
for name, o3 in [
    ("dlc_at",   "wxy zab cde fgh ijk lmn opq rstuv"),   # 33 chars, 8 words
    ("dlc_over", "wxy zab cde fgh ijk lmn opq rstu"),    # 32 chars, 8 words
]:
    tot = sum(len(o) for o in (o1, o2, o3)) + 2 * len(L)
    assert tot in (140, 139), (name, tot)
    docs[name] = "\n".join([L, o1, o2, L, o3])

# --- stop-word boundary: identical docs, hits 1 vs 2 ----------------
base_words = ["the"] + [filler(i + 400, 6) for i in range(21)]
docs["stop1"] = " ".join(base_words)
docs["stop2"] = " ".join(base_words + ["and"])

# --- validate --------------------------------------------------------
ids = {"top3_at": -1, "top3_over": -2, "top2_at": -3, "top2_over": -4,
       "dup5_at": -5, "dup5_over": -6, "dlc_at": -7, "dlc_over": -8,
       "stop1": -9, "stop2": -10}
expect = {  # (boundary metric, value, rep_keep, hits, overall keep)
    "top3_at":   ("top3", 0.18, True, 2, True),
    "top3_over": ("top3", r6(99 / 544), False, 2, False),
    "top2_at":   ("top2", 0.20, True, 2, True),
    "top2_over": ("top2", r6(70 / 345), False, 2, False),
    "dup5_at":   ("dup5", 0.15, True, 2, True),
    "dup5_over": ("dup5", r6(48 / 318), False, 2, False),
    "dlc_at":    ("dup_line_char_frac", 0.20, True, 2, True),
    "dlc_over":  ("dup_line_char_frac", r6(28 / 139), False, 2, False),
    "stop1":     (None, None, True, 1, False),
    "stop2":     (None, None, True, 2, True),
}
fail = False
for name, text in docs.items():
    r = repetition(text)
    n, mwl, skeep = structural(text)
    h = hits(text)
    metric, val, rk, eh, keep = expect[name]
    ok = (metric is None or r[metric] == val) and rep_keep(r) == rk \
        and h == eh and skeep and (skeep and rk and h >= 2) == keep
    status = "ok " if ok else "BAD"
    fail |= not ok
    print(f"{status} {name:10s} id={ids[name]:>3} words={n:3d} mean_wl={mwl:5.2f} "
          f"struct={skeep} rep={r} rep_keep={rep_keep(r)} hits={h}")
if fail:
    sys.exit(1)

print("\n--- Scala fixture entries ---")
for name in ids:
    print(f'      ({ids[name]}L, {docs[name]!r}),'.replace("'", '"'))
print("\n--- SQL VALUES ---")
for name in ids:
    t = docs[name].replace("\n", "' || chr(10) || '")
    print(f"              ({ids[name]}, '{t}'),")
