#!/usr/bin/env python3
"""Gate-key anchoring check (VERDICT r10 #2).

Every CORRECTNESS gate key (a `q_*` entry in SparkEntry.queries) must
be anchored in a SURVEY.md §2 gate CELL — the LAST column of a table
row — as a backticked `q_*` token. Prose mentions elsewhere in the row
do NOT count (the r9 version of this check matched anywhere in the
row, which let q_pii_mask / q_repetition pass unanchored).

Usage: python3 tools/anchors.py  (exit 1 + list if any key unanchored)
"""
import re, sys, pathlib

repo = pathlib.Path(__file__).resolve().parent.parent
survey = (repo / "SURVEY.md").read_text(encoding="utf-8")
entry = (repo / "src/main/scala/graft/SparkEntry.scala").read_text(
    encoding="utf-8")

# gate keys = SparkEntry.queries registrations: "q_xxx" -> (fn _)
keys = set(re.findall(r'"(q_[a-z0-9_]+)"\s*->', entry))

# §2 gate cells: markdown table rows whose first cell is a component id
# ([A-H]\d+). The gate column is the LAST non-empty cell.
anchored = set()
in_s2 = False
for line in survey.splitlines():
    if line.startswith("## "):
        in_s2 = line.startswith("## §2")
    if not in_s2 or not line.startswith("|"):
        continue
    # split on UNESCAPED pipes only — design cells legitimately
    # contain \| (e.g. conditional-probability notation P(v\|u))
    cells = [c.strip() for c in
             re.split(r"(?<!\\)\|", line.strip().strip("|"))]
    if len(cells) < 2 or not re.fullmatch(r"[A-H]\d+", cells[0]):
        continue
    # backticked keys ONLY, and only in the gate (last) cell
    anchored |= set(re.findall(r"`(q_[a-z0-9_]+)`", cells[-1]))

unanchored = sorted(keys - anchored)
dangling = sorted(anchored - keys)
print(f"[anchors] {len(keys)} gate keys, {len(anchored)} anchored "
      f"cell keys, {len(unanchored)} unanchored, {len(dangling)} "
      f"dangling (anchored but not registered)")
for k in unanchored:
    print(f"[anchors] UNANCHORED {k}")
for k in dangling:
    print(f"[anchors] DANGLING {k}")
sys.exit(1 if unanchored or dangling else 0)
