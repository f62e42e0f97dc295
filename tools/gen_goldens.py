#!/usr/bin/env python3
"""Generate golden files by EXECUTING the reference's pure text functions
(/root/reference/index_documents.py) over an adversarial corpus + fixture
texts. The reference module can't be imported wholesale offline (heavy
third-party imports), so we ast-extract only the dependency-free defs
(clean_text, chunkers) and exec them. The goldens pin our Scala
implementations to the reference's exact behavior (SURVEY.md §5 G1-G3).
Output: src/test/resources/golden/chunkers.jsonl (one JSON object per case).
"""
import ast, json, sys

SRC = "/root/reference/index_documents.py"
WANTED = {"clean_text", "chunk_fixed_with_overlap", "split_paragraphs",
          "split_sentences", "split_to_chunks"}

tree = ast.parse(open(SRC).read())
ns = {}
import re as _re
ns["re"] = _re
# typing names used in annotations
import typing
ns.update({"List": typing.List, "Literal": getattr(typing, "Literal", None)})
ns["SplitStrategy"] = str  # reference's Literal alias; only used in annotations
for node in tree.body:
    if isinstance(node, ast.FunctionDef) and node.name in WANTED:
        mod = ast.Module(body=[node], type_ignores=[])
        exec(compile(mod, SRC, "exec"), ns)
missing = WANTED - set(ns)
assert not missing, f"missing defs: {missing}"

import duckdb
texts = [r[0] for r in duckdb.connect().execute(
    "SELECT text FROM '/root/testdata/sf0.01/documents.parquet' ORDER BY doc_id LIMIT 30").fetchall()]

adversarial = [
    "", "   ", "a", "abcdefghij", "ab        cd",
    "a\n\nb\n \n\nc\nd", "  x  \n\n\n\n  y  ",
    "Dr. Smith went. Then Mr. Jones came! Did he? yes",
    "one. two. three. four. five. six. seven. eight. nine. ten.",
    "x" * 500 + ". " + "y" * 90 + ". short.",
    "tab\there\tand  spaces nbsp\nnewline\n\n\n\nmany",
    "Unicode: héllo wörld 北京 end. Another sentence!",
    "no terminal punctuation at all just words " * 5,
    "!!!. ???. ...",
    " \t\n mixed leading and trailing \n\t ",
    "a\n\xa0\nb\n\u2003\nc",          # NBSP / em-space between newlines (unicode \s)
    "end.\xa0Next sentence!\u2009Third.", # unicode whitespace after sentence punct
    "\xa0\xa0padded\xa0\xa0",
    # astral-plane (surrogate pairs in UTF-16): Python len counts code points
    "\U0001F600" * 15,                          # emoji-only, windows split mid-run
    "ab\U0001F600cd \U0001F680ef. tail\U0001F984!",  # mixed BMP + astral
    "\U0001F600\U0001F601. " * 12,              # astral sentences for grouping
    ("\U0001F6801234567890" * 12) + ". " + "plain tail.",
    # sentence-grouping boundary: buf_len + len(s) + 1 == target (target=200)
    # s0=100 -> buf_len=101 (phantom +1); s1=98: 101+98+1==200 -> appends;
    # any next sentence flushes. A buf_len tracker based on joined length
    # (199) would differ exactly here.
    "a" * 99 + ". " + "b" * 97 + ". " + "c" * 10 + ".",
    # post-flush reset: s0=150 -> bl=151; s1=60: flush, bl=60 (NOT 61);
    # s2=138: 60+138+1==199 <= 200 appends -- phantom +1 after flush would flush
    "d" * 149 + ". " + "e" * 59 + ". " + "f" * 137 + ".",
    # one past the boundary: s0=100, s1=99 -> 101+99+1==201 > 200 flushes
    "g" * 99 + ". " + "h" * 98 + ".",
]
corpus = adversarial + texts

cases = []
for i, t in enumerate(corpus):
    cases.append({"case": f"clean_{i}", "func": "clean_text", "text": t,
                  "expected": [ns["clean_text"](t)]})
    for (size, ov) in [(120, 20), (40, 10), (7, 3), (1200, 200)]:
        cases.append({"case": f"fixed_{i}_{size}_{ov}", "func": "fixed",
                      "text": t, "size": size, "overlap": ov,
                      "expected": ns["chunk_fixed_with_overlap"](t, size, ov)})
    cases.append({"case": f"para_{i}", "func": "paragraphs", "text": t,
                  "expected": ns["split_paragraphs"](t)})
    cases.append({"case": f"sent_{i}", "func": "sentences", "text": t,
                  "expected": ns["split_sentences"](t)})
    for size in [100, 250]:
        cases.append({"case": f"group_{i}_{size}", "func": "sentence_groups",
                      "text": t, "size": size,
                      "expected": ns["split_to_chunks"](t, "sentence", size, 0)})

import os
os.makedirs("src/test/resources/golden", exist_ok=True)
with open("src/test/resources/golden/chunkers.jsonl", "w") as f:
    for c in cases:
        f.write(json.dumps(c, ensure_ascii=False) + "\n")
print(f"wrote {len(cases)} golden cases")
