"""Japanese kana -> IPA converter.

Covers hiragana + katakana (incl. palatalized digraphs, sokuon gemination,
chōonpu long vowels, ん -> ɴ). Kanji requires a reading dictionary and is
out of scope: sentences containing kanji raise ValueError so the caller can
skip them (the reference delegated this to the external multipa converter;
CommonVoice Japanese sentences are mostly kana after its filtering).
"""

from __future__ import annotations

import re
import unicodedata
from typing import Dict, List

_BASE: Dict[str, str] = {
    "あ": "a", "い": "i", "う": "ɯ", "え": "e", "お": "o",
    "か": "ka", "き": "ki", "く": "kɯ", "け": "ke", "こ": "ko",
    "が": "ɡa", "ぎ": "ɡi", "ぐ": "ɡɯ", "げ": "ɡe", "ご": "ɡo",
    "さ": "sa", "し": "ɕi", "す": "sɯ", "せ": "se", "そ": "so",
    "ざ": "za", "じ": "dʑi", "ず": "zɯ", "ぜ": "ze", "ぞ": "zo",
    "た": "ta", "ち": "tɕi", "つ": "tsɯ", "て": "te", "と": "to",
    "だ": "da", "ぢ": "dʑi", "づ": "zɯ", "で": "de", "ど": "do",
    "な": "na", "に": "ɲi", "ぬ": "nɯ", "ね": "ne", "の": "no",
    "は": "ha", "ひ": "çi", "ふ": "ɸɯ", "へ": "he", "ほ": "ho",
    "ば": "ba", "び": "bi", "ぶ": "bɯ", "べ": "be", "ぼ": "bo",
    "ぱ": "pa", "ぴ": "pi", "ぷ": "pɯ", "ぺ": "pe", "ぽ": "po",
    "ま": "ma", "み": "mi", "む": "mɯ", "め": "me", "も": "mo",
    "や": "ja", "ゆ": "jɯ", "よ": "jo",
    "ら": "ɾa", "り": "ɾi", "る": "ɾɯ", "れ": "ɾe", "ろ": "ɾo",
    "わ": "wa", "ゐ": "i", "ゑ": "e", "を": "o",
    "ん": "ɴ",
    "ぁ": "a", "ぃ": "i", "ぅ": "ɯ", "ぇ": "e", "ぉ": "o",
    "ゔ": "vɯ",
}

_DIGRAPH_ONSET: Dict[str, str] = {
    "き": "kʲ", "ぎ": "ɡʲ", "し": "ɕ", "じ": "dʑ", "ち": "tɕ",
    "に": "ɲ", "ひ": "ç", "び": "bʲ", "ぴ": "pʲ", "み": "mʲ", "り": "ɾʲ",
}
_SMALL_VOWEL = {"ゃ": "a", "ゅ": "ɯ", "ょ": "o"}

_VOWELS = "aiɯeo"


def _to_hiragana(text: str) -> str:
    """Katakana -> hiragana (same phonology)."""
    out = []
    for ch in text:
        code = ord(ch)
        if 0x30A1 <= code <= 0x30F6:
            out.append(chr(code - 0x60))
        else:
            out.append(ch)
    return "".join(out)


def remove_ja_punct(text: str) -> str:
    return re.sub(r"[、。・「」『』！？!?,.\s]+", " ", text).strip()


def kana_to_ipa(text: str) -> str:
    """Convert a kana string to IPA. Raises on kanji/unknown CJK."""
    text = _to_hiragana(unicodedata.normalize("NFC", text))
    out: List[str] = []
    i = 0
    n = len(text)
    geminate_next = False
    while i < n:
        ch = text[i]
        if ch == "っ":
            geminate_next = True
            i += 1
            continue
        if ch == "ー":
            # chōonpu: lengthen previous vowel
            if out and out[-1] and out[-1][-1] in _VOWELS:
                out.append("ː")
            i += 1
            continue
        if ch.isspace():
            out.append(" ")
            i += 1
            continue
        nxt = text[i + 1] if i + 1 < n else ""
        if nxt in _SMALL_VOWEL and ch in _DIGRAPH_ONSET:
            syl = _DIGRAPH_ONSET[ch] + _SMALL_VOWEL[nxt]
            i += 2
        elif ch in _BASE:
            syl = _BASE[ch]
            i += 1
        elif 0x4E00 <= ord(ch) <= 0x9FFF:
            raise ValueError(f"kanji not supported without a reading dict: {ch!r}")
        else:
            i += 1
            continue
        if geminate_next and syl and syl[0] not in _VOWELS:
            out.append(syl[0])
            geminate_next = False
        out.append(syl)
    text_out = "".join(out)
    # corpus vowel conventions (multipa): centralized a, lowered o/e
    text_out = (
        text_out.replace("a", "ä").replace("o", "o̞").replace("e", "e̞")
    )
    # ん place assimilation
    text_out = re.sub(r"ɴ(?=[kɡ])", "ŋ", text_out)
    text_out = re.sub(r"ɴ(?=[pbm])", "m", text_out)
    text_out = re.sub(r"ɴ(?=[tdnɾ])", "n", text_out)
    # assimilated nasal + identical nasal -> geminate
    text_out = re.sub(r"nn", "nː", text_out)
    text_out = re.sub(r"mm", "mː", text_out)
    return text_out


class Japanese2IPA:
    """Reference-surface converter class."""

    def remove_ja_punct(self, text: str) -> str:
        return remove_ja_punct(text)

    def convert_sentence_to_ipa(self, text: str) -> str:
        return kana_to_ipa(text)
