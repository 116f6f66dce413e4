"""Data preparation tests: corpus converters, G2P, combine, verify, IAA."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from whisper_ipa_tpu.data.prep import (
    METUBET_TO_IPA,
    TIMIT_ARPABET_TO_IPA,
    analyze_dataset,
    apply_normalization,
    combine_datasets,
    compute_iaa,
    labels_to_ipa,
    parse_phn_file,
    parse_ptl_file,
    prepare_timit,
    text_to_ipa,
)


class TestPhonesets:
    def test_timit_table_size(self):
        # 61-label TIMIT set
        assert len(TIMIT_ARPABET_TO_IPA) == 61

    def test_closures_dropped(self):
        for c in ("bcl", "dcl", "kcl", "pau", "h#"):
            assert TIMIT_ARPABET_TO_IPA[c] == ""

    def test_allophones_preserved(self):
        assert TIMIT_ARPABET_TO_IPA["dx"] == "ɾ"
        assert TIMIT_ARPABET_TO_IPA["nx"] == "ɾ̃"
        assert TIMIT_ARPABET_TO_IPA["ax-h"] == "ə̥"
        assert TIMIT_ARPABET_TO_IPA["eng"] == "ŋ̍"

    def test_metubet_turkish_phones(self):
        assert METUBET_TO_IPA["I"] == "ɯ"
        assert METUBET_TO_IPA["GG"] == "ɟ"
        assert METUBET_TO_IPA["LL"] == "ɫ"

    def test_labels_to_ipa(self):
        alignment = [(0, 1, "h#"), (1, 2, "k"), (2, 3, "ae"), (3, 4, "t"),
                     (4, 5, "h#")]
        assert labels_to_ipa(alignment, TIMIT_ARPABET_TO_IPA) == "kæt"


class TestTimitPrep:
    @pytest.fixture()
    def timit_tree(self, tmp_path):
        """Synthetic TIMIT layout with one utterance."""
        utt = tmp_path / "TRAIN" / "DR1" / "FAKE0"
        utt.mkdir(parents=True)
        (utt / "SA1.PHN").write_text(
            "0 100 h#\n100 200 k\n200 300 ae\n300 400 t\n400 500 h#\n"
        )
        (utt / "SA1.TXT").write_text("0 500 cat\n")
        # empty WAV placeholder (prep only records the path)
        import wave

        with wave.open(str(utt / "SA1.WAV"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(b"\x00\x00" * 100)
        return tmp_path

    def test_prepare_timit(self, timit_tree, tmp_path):
        out = tmp_path / "out" / "timit_train_ipa.json"
        data = prepare_timit(timit_tree, out, split="TRAIN")
        assert len(data) == 1
        e = data[0]
        assert e["ipa_transcription"] == "kæt"
        assert e["orthographic_text"] == "cat"
        assert e["speaker_id"] == "FAKE0"
        assert e["phoneme_count"] == 3
        assert os.path.isfile(out)

    def test_parse_phn(self, timit_tree):
        phn = timit_tree / "TRAIN" / "DR1" / "FAKE0" / "SA1.PHN"
        parsed = parse_phn_file(phn)
        assert parsed[1] == (100, 200, "k")


class TestPtlParsing:
    def test_header_skipped(self, tmp_path):
        ptl = tmp_path / "x.ptl"
        ptl.write_text(
            "MillisecondsPerFrame: 3.0\nEND OF HEADER\n0 100 h#\n100 200 k\n"
        )
        parsed = parse_ptl_file(ptl)
        assert parsed == [(0, 100, "h#"), (100, 200, "k")]


class TestG2P:
    def test_finnish(self):
        # gemination -> ː, ä -> æ, v -> ʋ
        assert text_to_ipa("kissa", "fi") == "kisːɑ"
        assert text_to_ipa("äiti", "fi") == "æiti"
        assert text_to_ipa("vesi", "fi") == "ʋesi"
        assert text_to_ipa("kengät", "fi") == "keŋːæt"

    def test_hungarian(self):
        assert text_to_ipa("szép", "hu") == "seːp"
        assert text_to_ipa("gyerek", "hu") == "ɟɛrɛk"
        assert text_to_ipa("család", "hu") == "t͡ʃɒlaːd"

    def test_polish(self):
        assert text_to_ipa("szczur", "pl") == "ʂt͡ʂur"
        assert text_to_ipa("łódź", "pl") == "wut͡ɕ"  # final devoicing
        assert text_to_ipa("rzeka", "pl") == "ʐɛka"
        assert text_to_ipa("przy", "pl") == "pʂɨ"  # rz after voiceless
        assert text_to_ipa("nie", "pl") == "ɲɛ"  # palatal i-marker

    def test_greek(self):
        assert text_to_ipa("καλημέρα", "el") == "kalimeɾa"
        assert text_to_ipa("θάλασσα", "el") == "θalasa"
        # αυ/ευ voicing alternation
        assert text_to_ipa("αυριο", "el") == "avɾio"
        assert text_to_ipa("ευχαριστώ", "el") == "efxaɾisto"

    def test_maltese(self):
        assert text_to_ipa("xemx", "mt") == "ʃɛmʃ"
        assert text_to_ipa("qattus", "mt") == "ʔatːus"  # geminate tt

    def test_japanese_kana(self):
        # corpus conventions (measured against the reference CV ja IPA):
        # centralized ä, lowered o̞, C+j palatalization, oɯ -> o̞ː,
        # gemination as onset+ː, ん stays n before labials (np/nb in the
        # corpus, not mp/mb)
        assert text_to_ipa("ねこ", "ja") == "ne̞ko̞"
        assert text_to_ipa("きょう", "ja") == "kjo̞ː"
        assert text_to_ipa("がっこう", "ja") == "ɡäkːo̞ː"
        assert text_to_ipa("しんぶん", "ja") == "ɕinbɯɴ"
        # topic-particle heuristic: これは -> wä, はやく stays hä
        assert text_to_ipa("これは", "ja").endswith("wä")
        assert text_to_ipa("はやく", "ja").startswith("hä")

    def test_japanese_uncovered_kanji_skipped(self):
        # 日本 is now in the built-in reading table; an uncovered rare
        # kanji still raises so the pipeline skips the sentence
        assert text_to_ipa("日本", "ja")  # covered word converts
        with pytest.raises(ValueError):
            text_to_ipa("薔薇", "ja")

    def test_tamil(self):
        # அம்மா 'mother': m geminate + long a
        out = text_to_ipa("அம்மா", "ta")
        assert out.startswith("am")
        assert "aː" in out

    def test_unknown_language(self):
        with pytest.raises(ValueError):
            text_to_ipa("hello", "xx")

    def test_spaces_stripped(self):
        assert " " not in text_to_ipa("kissa istuu", "fi")


class TestCombineVerify:
    def test_combine(self, tmp_path):
        d = tmp_path / "processed"
        d.mkdir()
        for name, n in [
            ("timit_train_ipa.json", 3),
            ("timit_test_ipa.json", 2),
            ("metu_turkish_ipa.json", 2),
            ("ogi_spelled_ipa.json", 1),
        ]:
            with open(d / name, "w") as f:
                json.dump(
                    [{"audio_path": f"{name}-{i}", "ipa_transcription": "a"}
                     for i in range(n)],
                    f,
                )
        train, test = combine_datasets(d)
        assert len(train) == 6
        assert len(test) == 2
        assert all(e["split"] == "train" for e in train)
        assert {e["dataset_source"] for e in train} == {
            "timit", "metu_turkish", "ogi_spelled"
        }

    def test_verify_normalization(self, tmp_path):
        import unicodedata

        decomposed = unicodedata.normalize("NFD", "kæ̃t")
        path = tmp_path / "ds.json"
        with open(path, "w") as f:
            json.dump(
                [
                    {"ipa_transcription": "kæt"},
                    {"ipa_transcription": decomposed},
                ],
                f,
            )
        needs, changes = analyze_dataset(path)
        # NFD of æ̃ differs from NFC
        if unicodedata.normalize("NFC", decomposed) != decomposed:
            assert needs and len(changes) == 1
            out = apply_normalization(path)
            _, changes2 = analyze_dataset(out)
            assert not changes2


class TestIAA:
    def test_compute_iaa_synthetic(self, tmp_path):
        entries = [
            {
                "id": i,
                "ipa_ariga": a,
                "ipa_hamanishi": h,
                "has_both_annotators": True,
                "usable_for_iaa": True,
            }
            for i, (a, h) in enumerate(
                [("kæt", "kæt"), ("bʌtn̩", "bʌtn"), ("ətʃ", "ə̥tʃ")]
            )
        ]
        path = tmp_path / "zeroshot_test.json"
        with open(path, "w") as f:
            json.dump(entries, f)
        out = compute_iaa(path)
        assert out["num_pairs"] == 3
        assert out["ariga_ref"]["per"] >= 0
        assert len(out["candidates"]) == 4
        # identical first pair contributes 0 to all metrics
        assert out["ariga_ref"]["per_scores"][0] == 0.0


class TestMappingCSVLoader:
    def test_epitran_style_csv(self, tmp_path):
        from whisper_ipa_tpu.data.prep.g2p.engine import from_mapping_csv

        csv_path = tmp_path / "xyz-Latn.csv"
        csv_path.write_text("Orth,Phon\na,ɑ\nsz,s\ns,ʃ\n")
        conv = from_mapping_csv(str(csv_path))
        # longest match: sz -> s beats s -> ʃ
        assert conv("sza") == "sɑ"
        assert conv("sa") == "ʃɑ"


class TestXlsxRoundTrip:
    def test_write_read(self, tmp_path):
        from whisper_ipa_tpu.utils.xlsx import read_xlsx, write_xlsx

        rows = [
            ["ID", "IPA", "Elapsed Time (sec)"],
            [1.0, "kæt", 12.5],
            [2.0, "tʰiː ʌ ə̥", None],
            [None, None, None],
            [3.0, "?", 0.0],
        ]
        path = str(tmp_path / "annot.xlsx")
        write_xlsx(path, rows)
        back = read_xlsx(path)
        assert back[0] == rows[0]
        assert back[1] == [1.0, "kæt", 12.5]
        assert back[2][1] == "tʰiː ʌ ə̥"  # unicode + spaces preserved
        assert back[4] == [3.0, "?", 0.0]

    def test_records_header_mapping(self, tmp_path):
        from whisper_ipa_tpu.utils.xlsx import read_xlsx_records, write_xlsx

        path = str(tmp_path / "r.xlsx")
        write_xlsx(path, [["ID", "IPA"], [7.0, "ba"]])
        recs = read_xlsx_records(path)
        assert recs == [{"ID": 7.0, "IPA": "ba"}]


class TestZeroshotPipelineEndToEnd:
    """Full Excel -> cross-reference -> IAA path on synthetic annotators
    with a hand-computed agreement value (VERDICT r1 next-step 6). Only the
    data swap (real annotator sheets) remains for the 19.6% oracle."""

    def _make_inputs(self, tmp_path):
        import wave

        import numpy as np

        from whisper_ipa_tpu.utils.xlsx import write_xlsx

        # annotator sheets: id 41 is in BOTH poor-quality sets -> excluded
        # from usable_for_iaa; ids 1..4 usable; id 5 only one annotator
        ariga = [
            ["ID", "IPA", "Elapsed Time (sec)"],
            [1.0, "ta", 10.0],
            [2.0, "ta", 11.0],
            [3.0, "pa", 12.0],
            [4.0, "tata", 13.0],
            [5.0, "ka", 9.0],
            [41.0, "ma", 8.0],
        ]
        hama = [
            ["ID", "IPA", "Elapsed Time (sec)"],
            [1.0, "ta", 20.0],
            [2.0, "da", 21.0],  # voicing-only substitution vs ariga
            [3.0, "pa", 22.0],
            [4.0, "tata", 23.0],
            [41.0, "na", 18.0],
        ]
        a_path = tmp_path / "ariga.xlsx"
        h_path = tmp_path / "hamanishi.xlsx"
        write_xlsx(str(a_path), ariga)
        write_xlsx(str(h_path), hama)

        csv_path = tmp_path / "test_data.csv"
        csv_path.write_text(
            "ID,IPA,Done\n1,ta,1\n2,ta,1\n3,pa,1\n4,tata,1\n5,ka,1\n41,ma,1\n"
        )

        wav_dir = tmp_path / "wavs"
        wav_dir.mkdir()
        for i in (1, 2, 3, 4, 5, 41):
            with wave.open(str(wav_dir / f"{i}_abc.wav"), "w") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(np.zeros(160, np.int16).tobytes())
        return a_path, h_path, csv_path, wav_dir

    def test_full_pipeline_hand_computed_iaa(self, tmp_path):
        from whisper_ipa_tpu.data.prep.zeroshot import (
            build_zeroshot_json,
            compute_iaa,
        )

        a_path, h_path, csv_path, wav_dir = self._make_inputs(tmp_path)
        out_path = tmp_path / "zeroshot_test.json"
        entries = build_zeroshot_json(
            a_path, h_path, csv_path, wav_dir, out_path
        )

        by_id = {e["id"]: e for e in entries}
        # cross-reference: ariga matches test csv on ids 1,3,4,5,41 (5),
        # hamanishi on 1,3,4 (3) -> ariga is the gold annotator
        assert entries[0]["gold_annotator"] == "ariga"
        assert by_id[2]["gold_ipa"] == "ta"
        # id 41: both annotated but poor-quality on both sides -> unusable
        assert by_id[41]["has_both_annotators"]
        assert not by_id[41]["usable_for_iaa"]
        # id 5: single annotator -> not usable
        assert not by_id[5]["usable_for_iaa"]
        # wav cross-ref resolved
        assert by_id[1]["audio_path"].endswith("1_abc.wav")

        iaa = compute_iaa(out_path)
        assert iaa["num_pairs"] == 4  # ids 1..4
        # hand-computed: pairs (ta,ta), (ta,da), (pa,pa), (tata,tata)
        # PER: one substitution over 2 phones in pair 2 -> 50%; mean 12.5%
        assert iaa["ariga_ref"]["per"] == pytest.approx(12.5)
        # PFER-Hamming: t vs d differs ONLY in [voi] -> (1/24)/2 segments
        # *100 = 2.0833% for pair 2; mean over 4 pairs = 0.5208%
        assert iaa["ariga_ref"]["pfer_hamming"] == pytest.approx(
            100 * (1 / 24) / 2 / 4, abs=1e-6
        )
        # symmetric for this data
        assert iaa["hamanishi_ref"]["pfer_hamming"] == pytest.approx(
            iaa["ariga_ref"]["pfer_hamming"], abs=1e-9
        )


class TestKanjiG2P:
    def test_common_words_convert(self):
        from whisper_ipa_tpu.data.prep.g2p.japanese import (
            kana_to_ipa,
            kanji_to_kana,
        )

        assert kanji_to_kana("今日はいい天気です") == "きょうはいいてんきです"
        assert kanji_to_kana("水を飲みます") == "みずをのみます"
        # longest match: 日本語 beats 日本 + 語
        assert kanji_to_kana("日本語") == "にほんご"
        ipa = kana_to_ipa("私は学生です")
        assert ipa and all(0x4E00 > ord(c) or ord(c) > 0x9FFF for c in ipa)

    def test_uncovered_kanji_still_raises(self):
        from whisper_ipa_tpu.data.prep.g2p.japanese import kana_to_ipa

        with pytest.raises(ValueError, match="kanji"):
            kana_to_ipa("薔薇")

    def test_external_dictionary_env(self, tmp_path, monkeypatch):
        import whisper_ipa_tpu.data.prep.g2p.japanese as jm

        d = tmp_path / "kdict.tsv"
        d.write_text("薔薇\tばら\n", encoding="utf-8")
        monkeypatch.setenv("WHISPER_IPA_TPU_KANJI_DICT", str(d))
        monkeypatch.setattr(jm, "_kanji_dict_loaded", False)
        assert "bäɾä" in jm.kana_to_ipa("薔薇")
        # clean up the injected entry for other tests
        jm.KANJI_READINGS.pop("薔薇", None)
        jm._kanji_dict_loaded = False


class TestDerivedJaReadings:
    def test_ipa_to_kana_roundtrip(self):
        from whisper_ipa_tpu.data.prep.g2p.derive_ja_readings import (
            ipa_to_kana,
        )
        from whisper_ipa_tpu.data.prep.g2p.japanese import kana_to_ipa

        for ipa in ("ɡätsɯ", "ɲitɕi", "dʑɯː", "kjo̞ː", "ke̞ɴ",
                    "tɕːɯː", "çiɾä", "ɕo̞ːɡäkːo̞ː"):
            kana = ipa_to_kana(ipa)
            assert kana, ipa
            assert kana_to_ipa(kana) == ipa

    def test_corpus_tsv_ships_and_loads(self):
        import os

        import whisper_ipa_tpu.data.prep.g2p.japanese as jm

        tsv = os.path.join(
            os.path.dirname(os.path.abspath(jm.__file__)),
            "ja_readings_corpus.tsv",
        )
        assert os.path.isfile(tsv)
        n = sum(1 for ln in open(tsv, encoding="utf-8")
                if not ln.startswith("#"))
        assert n > 500  # derived from the reference CV ja corpus
        table = jm._kanji_dict()
        # a derived compound converts end-to-end
        with open(tsv, encoding="utf-8") as f:
            for ln in f:
                if ln.startswith("#"):
                    continue
                word, kana = ln.rstrip("\n").split("\t")
                assert table.get(word) == kana or word in table
                assert jm.kana_to_ipa(word)  # converts, never raises
                break

    def test_sokuon_compound_sandhi(self):
        from whisper_ipa_tpu.data.prep.g2p.japanese import kanji_to_kana

        # がく + こう -> がっこう via the composition rule (the word
        # itself is a built-in; use a synthetic compound instead)
        assert kanji_to_kana("発単") == "はったん"
