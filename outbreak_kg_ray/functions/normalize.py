"""Name-normalization chain for query-side grounding (M12).

Re-derivation of the Gilda preprocessing the reference applies when
building its custom grounder and grounding facet queries
(kg/client.py:344-350: replace_dashes → replace_greek_uni →
replace_greek_latin → replace_greek_spelled_out →
replace_roman_arabic → normalize). Gilda is public open source; this
module re-implements the chain's *semantics* from scratch so both the
lexicon and the query normalize to the same canonical form:

- every unicode dash variant becomes a space;
- Greek letters, unicode or spelled out, become their latin
  single-letter equivalents ("α" → "alpha" → "a"), so
  "Influenza Α Virus", "Influenza alpha Virus" and
  "Influenza A Virus" all share one key;
- standalone roman-numeral tokens I..X become arabic digits
  ("Type II" → "Type 2");
- case, surrounding whitespace and internal runs of whitespace are
  normalized last.

Only applied to NAME LOOKUPS (get_curie-style query grounding). The
NER text-scan path keeps its exact byte contract — normalization
never rewrites document text.
"""

from __future__ import annotations

import re

# unicode dash family: hyphen-minus, minus sign, hyphen, non-breaking
# hyphen, figure dash, en dash, em dash, horizontal bar
_DASHES = "-−‐‑‒–—―"
_DASH_RE = re.compile(f"[{_DASHES}]")

_GREEK_UNI = {
    "Α": "Alpha", "α": "alpha",
    "Β": "Beta", "β": "beta",
    "Γ": "Gamma", "γ": "gamma",
    "Δ": "Delta", "δ": "delta",
    "Ε": "Epsilon", "ε": "epsilon",
    "Ζ": "Zeta", "ζ": "zeta",
    "Η": "Eta", "η": "eta",
    "Θ": "Theta", "θ": "theta",
    "Ι": "Iota", "ι": "iota",
    "Κ": "Kappa", "κ": "kappa",
    "Λ": "Lambda", "λ": "lambda",
    "Μ": "Mu", "μ": "mu",
    "Ν": "Nu", "ν": "nu",
    "Ξ": "Xi", "ξ": "xi",
    "Ο": "Omicron", "ο": "omicron",
    "Π": "Pi", "π": "pi",
    "Ρ": "Rho", "ρ": "rho",
    "Σ": "Sigma", "σ": "sigma", "ς": "sigma",
    "Τ": "Tau", "τ": "tau",
    "Υ": "Upsilon", "υ": "upsilon",
    "Φ": "Phi", "φ": "phi",
    "Χ": "Chi", "χ": "chi",
    "Ψ": "Psi", "ψ": "psi",
    "Ω": "Omega", "ω": "omega",
}

_GREEK_TO_LATIN = {
    "alpha": "a", "beta": "b", "gamma": "g", "delta": "d",
    "epsilon": "e", "zeta": "z", "eta": "e", "theta": "th",
    "iota": "i", "kappa": "k", "lambda": "l", "mu": "m", "nu": "n",
    "xi": "x", "omicron": "o", "pi": "p", "rho": "r", "sigma": "s",
    "tau": "t", "upsilon": "u", "phi": "ph", "chi": "ch",
    "psi": "ps", "omega": "o",
}
_GREEK_WORD_RE = re.compile(
    r"\b(" + "|".join(sorted(_GREEK_TO_LATIN, key=len, reverse=True)) + r")\b",
    re.IGNORECASE,
)

_ROMAN = {
    "i": "1", "ii": "2", "iii": "3", "iv": "4", "v": "5",
    "vi": "6", "vii": "7", "viii": "8", "ix": "9", "x": "10",
}
# standalone roman tokens only when adjacent to a word (the common
# "Type II" / "HIV-1"-style suffix shape); a lone leading "I"/"V"/"X"
# word is left alone. Matched case-sensitively on upper/lower runs.
_ROMAN_RE = re.compile(
    r"(?<=\s)(?:I{1,3}|IV|V|VI{1,3}|IX|X)(?=\s|$)"
)


def replace_dashes(s: str, rep: str = " ") -> str:
    return _DASH_RE.sub(rep, s)


def replace_greek_uni(s: str) -> str:
    """Unicode Greek letters → spelled-out names."""
    for uni, spelled in _GREEK_UNI.items():
        if uni in s:
            s = s.replace(uni, spelled)
    return s


def replace_greek_latin(s: str) -> str:
    """Spelled-out Greek letter words → latin equivalents."""
    return _GREEK_WORD_RE.sub(
        lambda m: _GREEK_TO_LATIN[m.group(0).lower()], s
    )


def replace_roman_arabic(s: str) -> str:
    """Standalone roman-numeral tokens (I..X, uppercase) → digits."""
    return _ROMAN_RE.sub(lambda m: _ROMAN[m.group(0).lower()], s)


def normalize(s: str) -> str:
    """Lowercase, collapse whitespace, strip."""
    return re.sub(r"\s+", " ", s).strip().lower()


def norm_key(name: str) -> str:
    """The full chain in reference order (kg/client.py:345-350):
    dashes → greek-unicode → greek-spelled-out→latin → roman→arabic
    → normalize. Applied identically to lexicon names and queries."""
    s = replace_dashes(name, " ")
    s = replace_greek_uni(s)
    s = replace_greek_latin(s)
    s = replace_roman_arabic(s)
    return normalize(s)
