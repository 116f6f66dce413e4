"""Per-language grapheme-to-IPA converters (fi, hu, pl, el, mt).

Rule-based broad transcriptions of the standard orthographies, built on the
longest-match engine. Coverage matches the reference pipeline's converter
set (reference create_dataset_scripts/preprocess_local.py:30-107): Finnish
follows the improved converter's conventions (gemination -> ː, v -> ʋ,
ä/ö -> æ/ø); Hungarian and Polish replace the reference's Epitran
dependency with explicit rules; Greek and Maltese replace the external
multipa converters.
"""

from __future__ import annotations

from .engine import RuleG2P, geminate

# -- Finnish --------------------------------------------------------------
# (reference converters_improved/finnish_to_ipa.py conventions)
_FI_SINGLE = [
    ("a", "ɑ"), ("b", "b"), ("d", "d"), ("e", "e"), ("f", "f"),
    ("g", "ɡ"), ("h", "h"), ("i", "i"), ("j", "j"), ("k", "k"),
    ("l", "l"), ("m", "m"), ("n", "n"), ("o", "o"), ("p", "p"),
    ("r", "r"), ("s", "s"), ("t", "t"), ("u", "u"), ("v", "ʋ"),
    ("w", "w"), ("y", "y"), ("z", "z"), ("ä", "æ"), ("ö", "ø"),
]
finnish = RuleG2P(
    geminate(_FI_SINGLE)
    + [
        ("aa", "ɑː"), ("ee", "eː"), ("ii", "iː"), ("oo", "oː"),
        ("uu", "uː"), ("yy", "yː"), ("ää", "æː"), ("öö", "øː"),
        ("ng", "ŋː"), ("nk", "ŋk"),
    ]
)

# -- Hungarian ------------------------------------------------------------
_HU_SINGLE = [
    ("a", "ɒ"), ("b", "b"), ("c", "ts"), ("d", "d"), ("e", "ɛ"),
    ("f", "f"), ("g", "ɡ"), ("h", "h"), ("i", "i"), ("j", "j"),
    ("k", "k"), ("l", "l"), ("m", "m"), ("n", "n"), ("o", "o"),
    ("p", "p"), ("r", "r"), ("s", "ʃ"), ("t", "t"), ("u", "u"),
    ("v", "v"), ("z", "z"),
]
hungarian = RuleG2P(
    geminate(_HU_SINGLE)
    + [
        ("á", "aː"), ("é", "eː"), ("í", "iː"), ("ó", "oː"),
        ("ö", "ø"), ("ő", "øː"), ("ú", "uː"), ("ü", "y"), ("ű", "yː"),
        ("cs", "tʃ"), ("dz", "dz"), ("dzs", "dʒ"), ("gy", "ɟ"),
        ("ly", "j"), ("ny", "ɲ"), ("sz", "s"), ("ty", "c"), ("zs", "ʒ"),
        # geminated digraphs (written as e.g. ssz, tty, nny)
        ("ssz", "sː"), ("zzs", "ʒː"), ("ccs", "tʃː"), ("tty", "cː"),
        ("ggy", "ɟː"), ("nny", "ɲː"), ("lly", "jː"),
    ]
)

# -- Polish ---------------------------------------------------------------
polish = RuleG2P(
    [
        ("a", "a"), ("ą", "ɔ̃"), ("b", "b"), ("c", "ts"), ("ć", "tɕ"),
        ("d", "d"), ("e", "ɛ"), ("ę", "ɛ̃"), ("f", "f"), ("g", "ɡ"),
        ("h", "x"), ("i", "i"), ("j", "j"), ("k", "k"), ("l", "l"),
        ("ł", "w"), ("m", "m"), ("n", "n"), ("ń", "ɲ"), ("o", "ɔ"),
        ("ó", "u"), ("p", "p"), ("r", "r"), ("s", "s"), ("ś", "ɕ"),
        ("t", "t"), ("u", "u"), ("w", "v"), ("y", "ɨ"), ("z", "z"),
        ("ź", "ʑ"), ("ż", "ʐ"),
        ("ch", "x"), ("cz", "tʂ"), ("dz", "dz"), ("dź", "dʑ"),
        ("dż", "dʐ"), ("rz", "ʐ"), ("sz", "ʂ"),
        # ci/si/zi/ni + vowel -> palatals
        ("ci", "tɕi"), ("si", "ɕi"), ("zi", "ʑi"), ("ni", "ɲi"),
    ]
)

# -- Greek (modern) -------------------------------------------------------
greek = RuleG2P(
    [
        ("α", "a"), ("β", "v"), ("γ", "ɣ"), ("δ", "ð"), ("ε", "e"),
        ("ζ", "z"), ("η", "i"), ("θ", "θ"), ("ι", "i"), ("κ", "k"),
        ("λ", "l"), ("μ", "m"), ("ν", "n"), ("ξ", "ks"), ("ο", "o"),
        ("π", "p"), ("ρ", "r"), ("σ", "s"), ("ς", "s"), ("τ", "t"),
        ("υ", "i"), ("φ", "f"), ("χ", "x"), ("ψ", "ps"), ("ω", "o"),
        # digraph vowels
        ("αι", "e"), ("ει", "i"), ("οι", "i"), ("ου", "u"), ("υι", "i"),
        # nasal+stop digraphs
        ("μπ", "b"), ("ντ", "d"), ("γκ", "ɡ"), ("γγ", "ŋɡ"),
        ("τσ", "ts"), ("τζ", "dz"),
        # modern Greek degeminates double consonants
        ("σσ", "s"), ("λλ", "l"), ("μμ", "m"), ("νν", "n"), ("ππ", "p"),
        ("ττ", "t"), ("κκ", "k"), ("ρρ", "r"), ("ββ", "v"),
        # accented vowels
        ("ά", "a"), ("έ", "e"), ("ή", "i"), ("ί", "i"), ("ό", "o"),
        ("ύ", "i"), ("ώ", "o"), ("ϊ", "i"), ("ϋ", "i"), ("ΐ", "i"),
        ("ΰ", "i"),
    ],
    post=[
        # αυ/ευ: v before voiced, f before voiceless
        (r"a(?:υ|ύ)(?=[bdɡvðzmnlrɣ aeiou])", "av"),
        (r"e(?:υ|ύ)(?=[bdɡvðzmnlrɣ aeiou])", "ev"),
        (r"a(?:υ|ύ)", "af"),
        (r"e(?:υ|ύ)", "ef"),
        # palatalization of velars before front vowels
        (r"k(?=[ie])", "c"),
        (r"x(?=[ie])", "ç"),
        (r"ɣ(?=[ie])", "ʝ"),
    ],
)

# -- Maltese --------------------------------------------------------------
maltese = RuleG2P(
    [
        ("a", "a"), ("b", "b"), ("d", "d"), ("e", "ɛ"), ("f", "f"),
        ("g", "ɡ"), ("h", ""), ("i", "i"), ("j", "j"), ("k", "k"),
        ("l", "l"), ("m", "m"), ("n", "n"), ("o", "ɔ"), ("p", "p"),
        ("q", "ʔ"), ("r", "r"), ("s", "s"), ("t", "t"), ("u", "u"),
        ("v", "v"), ("w", "w"), ("x", "ʃ"), ("z", "ts"),
        ("ċ", "tʃ"), ("ġ", "dʒ"), ("ħ", "ħ"), ("ż", "z"),
        ("għ", ""),  # silent, typically lengthens the adjacent vowel
        ("ie", "iː"),
    ]
)

CONVERTERS = {
    "fi": finnish,
    "hu": hungarian,
    "pl": polish,
    "el": greek,
    "mt": maltese,
}
