#!/usr/bin/env python3
"""Extend clean_golden.json with fuzz cases: random mixes of Hangul,
ASCII, emoji, HTML, JS, URLs, template tags, garbage-range chars —
reference semantics computed with Python `re` as the TEST ORACLE.
(bs4/torch stubbed; only the pattern battery is exercised.)
"""
import importlib.util
import json
import random
import sys
import types

sys.modules['bs4'] = types.SimpleNamespace(BeautifulSoup=None)
spec = importlib.util.spec_from_file_location('tc', '/root/reference/modules/text_cleaner.py')
tc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(tc)
TC = tc.TextCleaner

random.seed(42)
FRAGS = [
    "한국어 문장입니다", "plain english words", "12345", "  spaces  ",
    "<div class='x'>tag</div>", "{{template}}", "{% block %}", "${var}",
    "javascript:void(0)", 'onclick="do()"', "function(){return 1}",
    "\U0001F600\U0001F680\U0001F389", "Copyright FooCorp 2023", "Page 7 of 9",
    "www.example.com", "https://a.b/c?d=e", "Ру́сский", "καὶ", "─│┌┐",
    "①②③", "日本語かな", "ㄱㄴㄷ", "ㅏㅑㅓ", "가나다라마바사", "A B C D E",
    "x1", "ab12", "한a1글", "\n", "\n\n", "\t", "저0 저0",
    "원본 그림의 이름: pic.png", "640pixel", "그림입니다 도형", "★☆♥",
    "e=mc2", "test@mail.com", "path/to/file",
    "quoted 'text' and \"more\"", "[[wiki link]]", "<% erb tag %>",
    "…", "™©®", "half-width ｶﾀｶﾅ", "ﬁﬂ ligatures", "ẞ", "İstanbul",
]
cases = []
for _ in range(120):
    n = random.randint(1, 12)
    cases.append("".join(random.choice([" ", "", "\n"]) + random.choice(FRAGS) for _ in range(n)))
cases += ["", " ", "\n\n\n", "a" * 5000, "가" * 5000, "<p>x</p>" * 500,
          "힣가", "\U0001F1F0\U0001F1F7\U0001F1FA\U0001F1F8 flags"]

path = '/root/repo/src/test/resources/clean_golden.json'
golden = json.load(open(path))
existing = {g["input"] for g in golden}
for c in cases:
    if c not in existing:
        golden.append({"input": c, "clean": TC.clean_text(c), "hwp": TC.clean_hwp_text(c)})
json.dump(golden, open(path, 'w'), ensure_ascii=False, indent=1)
print("total golden cases:", len(golden))
