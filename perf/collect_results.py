"""Copy small measurement artifacts into the tracked results/ dir.

/tmp is wiped on every VM reboot and artifacts/ is gitignored (it holds
multi-GB checkpoints) — but the JSON result files backing docs/PERF.md's
numbers are tiny and must survive in git (round-4 verdict: "result JSONs
should live in the repo, not /tmp"). This collects every known result
JSON from artifacts/ (and legacy /tmp locations when present) into
results/, prefixed by run so reruns don't clobber history.

Usage: python perf/collect_results.py   (idempotent; prints what it did)
"""

from __future__ import annotations

import json
import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "results")

# (source glob-less path, destination name)
CANDIDATES = [
    ("artifacts/corpus/run_tiny/corpus_scale.json",
     "corpus_scale_tiny.json"),
    ("artifacts/corpus/run_tiny/corpus_report.json",
     "corpus_report_tiny.json"),
    ("artifacts/corpus/run_tiny/training_summary.json",
     "training_summary_tiny.json"),
    ("artifacts/corpus/run_small/corpus_scale.json",
     "corpus_scale_small.json"),
    ("artifacts/corpus/run_small/corpus_report.json",
     "corpus_report_small.json"),
    ("artifacts/corpus/run_small/training_summary.json",
     "training_summary_small.json"),
    ("artifacts/corpus/medusa_small.safetensors.accuracy.json",
     "medusa_small_accuracy.json"),
    ("artifacts/corpus/run_small/perturbed_eval.json",
     "perturbed_eval_small.json"),
    ("artifacts/corpus/run_tiny/perturbed_eval.json",
     "perturbed_eval_tiny.json"),
    # legacy /tmp locations (pre-reboot-proofing runs)
    ("/tmp/corpus/run_tiny/corpus_report.json",
     "corpus_report_tiny.json"),
    ("/tmp/corpus/run_small/corpus_report.json",
     "corpus_report_small.json"),
    ("/tmp/gen_exp/generalization.json", "generalization_tiny.json"),
]


def main() -> None:
    os.makedirs(RESULTS, exist_ok=True)
    copied = 0
    for src, dst_name in CANDIDATES:
        path = src if os.path.isabs(src) else os.path.join(REPO, src)
        if not os.path.isfile(path):
            continue
        dst = os.path.join(RESULTS, dst_name)
        if os.path.isfile(dst):
            try:  # keep the newer file
                if os.path.getmtime(dst) >= os.path.getmtime(path):
                    continue
            except OSError:
                continue
        # validate it's real JSON before tracking it
        try:
            with open(path) as f:
                json.load(f)
        except Exception as e:
            print(f"skip {path}: not valid JSON ({e})")
            continue
        shutil.copyfile(path, dst)
        print(f"{path} -> results/{dst_name}")
        copied += 1
    print(f"collected {copied} result file(s) into {RESULTS}")


if __name__ == "__main__":
    main()
