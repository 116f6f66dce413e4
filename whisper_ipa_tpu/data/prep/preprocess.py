"""CommonVoice G2P preprocessing: TSV -> filtered, sampled IPA JSON.

The reference pipeline (create_dataset_scripts/preprocess_local.py): per
language, read CommonVoice train/dev/test.tsv, apply quality filters
(length 2..500, <=1 down-vote, dedup, no URLs), drop clips longer than 6 s
(header-only duration probe), sample deterministically (seed 42), convert
sentences to IPA, emit the common JSON schema. Three quality modes exist in
the reference (raw/filtered/improved); here 'raw' skips the quality filters
and both other modes apply them, with the first-party improved converters
always used.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Sequence

from .audio_meta import get_audio_duration
from .g2p import SUPPORTED_LANGUAGES, text_to_ipa

TAMIL_EXCLUDE_CHAR = "ச"  # reference excludes sentences with ச (ambiguous G2P)


def apply_filters(df):
    """The 5 quality filters (reference preprocess_local.py:120-142)."""
    before = len(df)
    df = df[df["sentence"].astype(str).str.len() <= 500]
    df = df[df["sentence"].astype(str).str.len() >= 2]
    if "down_votes" in df.columns:
        df = df[df["down_votes"] <= 1]
    df = df.drop_duplicates(subset="sentence", keep="first")
    df = df[
        ~df["sentence"]
        .astype(str)
        .str.contains(r"https?://", regex=True, na=False)
    ]
    print(f"  Filtering: {before} -> {len(df)} ({before - len(df)} removed)")
    return df.reset_index(drop=True)


def process_language(
    lang: str,
    dataset_root: Path,
    num_samples: int,
    mode: str = "improved",
    split: str = "train",
    max_duration_s: float = 6.0,
    seed: int = 42,
) -> List[Dict]:
    """One language x split -> list of pipeline-schema entries."""
    import pandas as pd

    dataset_root = Path(dataset_root)
    tsv = dataset_root / lang / f"{split}.tsv"
    if not tsv.exists():
        raise FileNotFoundError(f"missing TSV: {tsv}")
    df = pd.read_csv(tsv, sep="\t", low_memory=False)
    print(f"{lang}/{split}: {len(df)} rows")

    if mode in ("filtered", "improved"):
        df = apply_filters(df)

    clips_dir = dataset_root / lang / "clips"

    # duration filter via header probe, then deterministic sampling
    durations_ok = []
    for _, row in df.iterrows():
        path = clips_dir / str(row["path"])
        dur = get_audio_duration(str(path)) if path.exists() else None
        durations_ok.append(dur is not None and dur <= max_duration_s)
    df = df[pd.Series(durations_ok, index=df.index)].reset_index(drop=True)
    print(f"  After <= {max_duration_s}s duration filter: {len(df)}")

    if num_samples and len(df) > num_samples:
        df = df.sample(num_samples, random_state=seed).reset_index(drop=True)

    entries: List[Dict] = []
    errors = 0
    for _, row in df.iterrows():
        sentence = str(row["sentence"])
        if lang == "ta" and TAMIL_EXCLUDE_CHAR in sentence:
            continue
        try:
            ipa = text_to_ipa(sentence, lang, mode)
        except Exception as e:
            errors += 1
            if errors <= 5:
                print(f"  Warning: G2P failed for {sentence[:40]!r}: {e}")
            continue
        if not ipa:
            continue
        entries.append(
            {
                "audio_path": str(clips_dir / str(row["path"])),
                "sentence": sentence,
                "ipa_transcription": ipa,
                "locale": lang,
                "path": str(row["path"]),
                "dataset_source": "commonvoice",
                "speaker_id": str(row.get("client_id", "unknown")),
            }
        )
    if errors:
        # skip-rate contract (round-5 verdict): the ja split silently
        # shrank when uncovered-kanji sentences were dropped — always
        # say how much of the split the G2P actually covered
        attempted = errors + len(entries)
        print(
            f"  {errors} rows skipped (G2P errors) — "
            f"{lang}/{split} G2P skip rate "
            f"{100.0 * errors / max(attempted, 1):.1f}% "
            f"({len(entries)}/{attempted} kept)"
        )
    return entries


def create_datasets(
    dataset_root: Path,
    output_dir: Path,
    languages: Sequence[str] = SUPPORTED_LANGUAGES,
    mode: str = "improved",
    train_n: int = 1000,
    val_n: int = 200,
    test_n: int = 100,
    seed: int = 42,
) -> Dict[str, int]:
    """All languages x {train,dev,test} -> combined JSON files
    (the reference create_all_datasets driver, one mode)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    counts = {}
    for split, n in (("train", train_n), ("dev", val_n), ("test", test_n)):
        combined: List[Dict] = []
        for lang in languages:
            try:
                combined.extend(
                    process_language(
                        lang, dataset_root, n, mode=mode, split=split, seed=seed
                    )
                )
            except FileNotFoundError as e:
                print(f"  Skipping {lang}/{split}: {e}")
        out_name = {
            "train": "combined_train_ipa.json",
            "dev": "combined_val_ipa.json",
            "test": "combined_test_ipa.json",
        }[split]
        with open(output_dir / out_name, "w", encoding="utf-8") as f:
            json.dump(combined, f, ensure_ascii=False, indent=2)
        counts[split] = len(combined)
        print(f"{split}: {len(combined)} entries -> {out_name}")
    return counts


def analyze_language(lang: str, dataset_root: Path, split: str = "train") -> Dict:
    """Per-language TSV quality audit (reference analyze_dataset.py)."""
    import pandas as pd

    tsv = Path(dataset_root) / lang / f"{split}.tsv"
    df = pd.read_csv(tsv, sep="\t", low_memory=False)
    sentences = df["sentence"].astype(str)
    clips_dir = Path(dataset_root) / lang / "clips"
    report = {
        "language": lang,
        "rows": len(df),
        "duplicates": int(sentences.duplicated().sum()),
        "html_entities": int(sentences.str.contains(r"&[a-z]+;", na=False).sum()),
        "urls": int(sentences.str.contains(r"https?://", na=False).sum()),
        "too_short": int((sentences.str.len() < 2).sum()),
        "too_long": int((sentences.str.len() > 500).sum()),
        "down_voted": int(
            (df["down_votes"] > 1).sum() if "down_votes" in df.columns else 0
        ),
        "missing_clips": int(
            sum(
                not (clips_dir / str(p)).exists()
                for p in df["path"].head(1000)
            )
        ),
    }
    print(json.dumps(report, indent=2))
    return report
