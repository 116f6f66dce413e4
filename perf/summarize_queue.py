"""Summarize the r4 TPU queue logs (/tmp/q_*.log + /tmp/qmark markers)
into a PERF.md-ready digest: per-item status, the headline lines each
bench prints, and the JSON result blobs (BEAM/CAPACITY/CORPUS_SCALE/
bench.py's driver line).

Usage: python perf/summarize_queue.py [--logdir /tmp] [--markdir /tmp/qmark]
"""

import argparse
import glob
import os
import re

# one-line patterns worth surfacing per log (tried in order, all hits kept)
PATTERNS = [
    re.compile(r"^\{\"metric\".*"),              # bench.py driver JSON
    re.compile(r"^(BEAM|CAPACITY|CORPUS_SCALE) .*"),
    re.compile(r".*(tokens/round|accept|speedup|RTF|rtf).*", re.I),
    re.compile(r".*(TTFT|p50|p90).*"),
    re.compile(r".*(PASS|FAIL|parity|MFU|ms/token|ms per decode).*"),
    re.compile(r"^(Step \d+|validation|New best|final).*", re.I),
    re.compile(r".*(Error|Traceback|OOM|RESOURCE_EXHAUSTED).*"),
]
MAX_LINES_PER_LOG = 40


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp")
    ap.add_argument("--markdir", default="/tmp/qmark")
    args = ap.parse_args()

    marks = {}
    for f in sorted(glob.glob(os.path.join(args.markdir, "*.done"))):
        name = os.path.basename(f)[: -len(".done")]
        with open(f) as fh:
            marks[name] = fh.read().strip()

    print("== queue markers ==")
    if not marks:
        print("  (none — queue has not run)")
    for name, status in marks.items():
        print(f"  {name}: {status}")

    for log in sorted(glob.glob(os.path.join(args.logdir, "q_*.log"))):
        name = os.path.basename(log)
        try:
            with open(log, errors="replace") as fh:
                lines = fh.readlines()
        except OSError as e:
            print(f"\n== {name}: unreadable ({e})")
            continue
        hits = []
        for ln in lines:
            ln = ln.rstrip()
            if any(p.search(ln) for p in PATTERNS):
                hits.append(ln)
        print(f"\n== {name} ({len(lines)} lines) ==")
        if not hits:
            tail = [x.rstrip() for x in lines[-5:]]
            print("  (no headline lines matched; tail:)")
            for t in tail:
                print(f"  | {t}")
        for h in hits[-MAX_LINES_PER_LOG:]:
            print(f"  {h}")


if __name__ == "__main__":
    main()
