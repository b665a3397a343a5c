#!/usr/bin/env python3
"""Construct the language-detect boundary-fixture documents for
q_lang_content / q_lang_query (VERDICT r14 #7, the gen_gopher_boundary
pattern): documents engineered EXACTLY AT and just above each ratio
threshold the two divergent detectors publish — C14 content detect
(korean > 0.10, vietnamese > 0.02, english > 0.30, argmax fallback
with kr >= vi >= en tie order, empty -> korean) and C15 query detect
(korean > 0.1, vietnamese > 0.05 on the LOWERED text against a larger
diacritic set, empty -> english) — so the oracle diff certifies the
boundary semantics (> excludes the exact threshold) and the divergent
constants/defaults between the two detectors, not just the bulk
corpus. Every doc is exactly 100 chars (except the empty-text doc), so
the at/over ratios are exact k/100 rationals whose IEEE behavior both
engines share.

The en > 0.30 threshold has NO observable at/over flip on any single
document: with en not tripping at 0.30, the argmax fallback still
returns english unless kr >= en or vi >= en — but kr >= 0.30 > 0.10
(resp. vi >= 0.30 > 0.02) would have tripped its own earlier branch.
The chain ORDER around it is pinned instead (c14_order: kr above its
threshold beats en = 0.80).

This script VALIDATES every doc against faithful replicas of both
detectors and prints the docs as Scala fixture entries + SQL VALUES.
Run it after editing; it exits non-zero if any doc misses its target.
"""
import sys

# C14 sets (html_loader.py:121-123 semantics, LanguageDetect.scala)
C14_VI = set("ăâđêôơưĂÂĐÊÔƠƯàáảãạèéẻẽẹìíỉĩịòóỏõọùúủũụỳýỷỹỵ")
# C15 set (search_utils.py:13-33 semantics), counted on lower(text)
C15_VI = set("àáạảãâầấậẩẫăằắặẳẵèéẹẻẽêềếệểễìíịỉĩòóọỏõôồốộổỗơờớợởỡùúụủũưừứựửữỳýỵỷỹđ")


def is_hangul(c):
    return "가" <= c <= "힣"


def detect_content(text):  # C14
    total = len(text)
    if total == 0:
        return "korean"
    kr = sum(1 for c in text if is_hangul(c)) / total
    vi = sum(1 for c in text if c in C14_VI) / total
    en = sum(1 for c in text if c.isascii() and c.isalpha()) / total
    if kr > 0.10:
        return "korean"
    if vi > 0.02:
        return "vietnamese"
    if en > 0.30:
        return "english"
    if kr >= vi and kr >= en:
        return "korean"
    if vi >= en:
        return "vietnamese"
    return "english"


def detect_query(text):  # C15
    total = len(text)
    if total == 0:
        return "english"
    kr = sum(1 for c in text if is_hangul(c))
    vi = sum(1 for c in text.lower() if c in C15_VI)
    if kr > 0.1 * total:
        return "korean"
    if vi > 0.05 * total:
        return "vietnamese"
    return "english"


def doc(kr=0, vi=0, en=0, vi_char="à", pad=100):
    s = "가" * kr + vi_char * vi + "a" * en
    assert len(s) <= pad
    return s + "0" * (pad - len(s))


# name -> (text, expected C14 content label, expected C15 query label)
docs = {
    # kr threshold at/over: shared boundary value (0.10) of BOTH detectors
    "kr_at":    (doc(kr=10, en=20), "english", "english"),
    "kr_over":  (doc(kr=11, en=20), "korean", "korean"),
    # C14 vi threshold at/over (0.02)
    "vi14_at":   (doc(vi=2, en=20), "english", "english"),
    "vi14_over": (doc(vi=3, en=20), "vietnamese", "english"),
    # C15 vi threshold at/over (0.05); same docs show C14's divergent 0.02
    "vi15_at":   (doc(vi=5), "vietnamese", "english"),
    "vi15_over": (doc(vi=6), "vietnamese", "vietnamese"),
    # C14 argmax tie order kr >= vi (equal ratios -> korean; vi ahead -> vietnamese)
    "tie_krvi":  (doc(kr=1, vi=1), "korean", "english"),
    "tie_krvi2": (doc(kr=1, vi=2), "vietnamese", "english"),
    # C14 argmax tie order vi >= en (equal -> vietnamese; en ahead -> english)
    "tie_vien":  (doc(vi=1, en=1), "vietnamese", "english"),
    "tie_vien2": (doc(vi=1, en=2), "english", "english"),
    # chain order: kr over-threshold beats en = 0.80 (C14) / pure-kr (C15)
    "order":     (doc(kr=15, en=80, pad=100), "korean", "korean"),
    # divergent empty-input defaults: the headline C14/C15 asymmetry
    "empty":     ("", "korean", "english"),
    # C15 lowercases before counting; 'À' is in C15's set only after
    # lower() and in C14's raw set not at all (C14 lists ĂÂĐÊÔƠƯ upper)
    "upper_vi":  (doc(vi=6, en=1, vi_char="À"), "english", "vietnamese"),
}

ids = {name: -(10 + i + 1) for i, name in enumerate(docs)}

fail = False
for name, (text, want14, want15) in docs.items():
    got14, got15 = detect_content(text), detect_query(text)
    ok = got14 == want14 and got15 == want15 and len(text) in (0, 100)
    fail |= not ok
    print(f"{'ok ' if ok else 'BAD'} {name:10s} id={ids[name]:>3} len={len(text):3d} "
          f"C14={got14:10s} (want {want14:10s}) C15={got15:10s} (want {want15})")
if fail:
    sys.exit(1)

print("\n--- Scala fixture entries ---")
for name in ids:
    t = docs[name][0]
    print(f'      ({ids[name]}L, "{t}"),')
print("\n--- SQL VALUES ---")
for name in ids:
    print(f"              ({ids[name]}, '{docs[name][0]}'),")
