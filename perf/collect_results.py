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

import glob
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


# Measurement queue logs + done-markers: the raw evidence behind the
# PERF.md tables. /tmp is reboot-volatile (it already ate queues 6/7's
# markers this round), so snapshot anything small enough for git.
LOG_GLOBS = ["/tmp/q8_*.log", "/tmp/qmark8/*.done", "/tmp/queue_run.log",
             "/tmp/watch8.log", "/tmp/supervisor8.log",
             "/tmp/q9_*.log", "/tmp/qmark9/*.done",
             "/tmp/watch9.log", "/tmp/supervisor9.log"]
MAX_LOG_BYTES = 2 * 1024 * 1024


def collect_logs() -> int:
    dst_dir = os.path.join(RESULTS, "logs")
    os.makedirs(dst_dir, exist_ok=True)
    copied = 0
    for pattern in LOG_GLOBS:
        for path in sorted(glob.glob(pattern)):
            try:
                size = os.path.getsize(path)
            except OSError:
                continue
            if size > MAX_LOG_BYTES:
                # keep the tail — the summary/result lines live there
                dst = os.path.join(dst_dir, os.path.basename(path))
                with open(path, "rb") as f:
                    f.seek(-MAX_LOG_BYTES, os.SEEK_END)
                    data = f.read()
                with open(dst, "wb") as f:
                    f.write(b"[truncated to last 2 MiB]\n" + data)
            else:
                name = os.path.basename(path)
                if path.endswith(".done"):
                    mark = os.path.basename(os.path.dirname(path))
                    name = mark + "_" + name
                dst = os.path.join(dst_dir, name)
                shutil.copyfile(path, dst)
            copied += 1
    return copied


def main() -> None:
    os.makedirs(RESULTS, exist_ok=True)
    copied = 0
    for src, dst_name in CANDIDATES:
        path = src if os.path.isabs(src) else os.path.join(REPO, src)
        if not os.path.isfile(path):
            continue
        dst = os.path.join(RESULTS, dst_name)
        # validate it's real JSON before tracking it
        try:
            with open(path) as f:
                src_text = f.read()
            json.loads(src_text)
        except Exception as e:
            print(f"skip {path}: not valid JSON ({e})")
            continue
        if os.path.isfile(dst):
            with open(dst) as f:
                if f.read() == src_text:
                    continue  # already collected
            # NEVER clobber an already-tracked result with a different
            # re-run (e.g. queue 9's deadline-sized 1000-step tiny vs
            # the tracked 4000-step run): keep both, suffixed.
            stem, ext = os.path.splitext(dst_name)
            dst_name = f"{stem}_q9{ext}"
            dst = os.path.join(RESULTS, dst_name)
            if os.path.isfile(dst):
                with open(dst) as f:
                    if f.read() == src_text:
                        continue
        shutil.copyfile(path, dst)
        print(f"{path} -> results/{dst_name}")
        copied += 1
    n_logs = collect_logs()
    print(f"collected {copied} result file(s) + {n_logs} log(s) into {RESULTS}")


if __name__ == "__main__":
    main()
