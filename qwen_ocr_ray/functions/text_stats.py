"""Text analysis kernels: language ID, quality scoring, token counting.

Heuristic, deterministic, vectorized where the kernel allows (polars string
ops); pure functions of the text. The stopword profiles are tiny hand-rolled
lists for the five corpus languages — a real deployment would swap in
fastText/CLD3 behind the same stage seam.
"""

from __future__ import annotations

import re

import numpy as np
import polars as pl

# Minimal high-frequency function-word profiles.
LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is that it for on with as are was".split()),
    "de": frozenset("der die das und ist von zu mit den ein eine nicht im für auf".split()),
    "fr": frozenset("le la les et de des un une est dans pour que sur avec au".split()),
    "es": frozenset("el la los las y de un una es en para que por con del".split()),
    "zh": frozenset("的 是 在 了 和 有 我 不 这 为 与 也 上 中 个".split()),
}

TOKEN_RE = re.compile(r"[A-Za-z]+(?:'[A-Za-z]+)?|\d+|[^\sA-Za-z\d]")


def lang_id(text: str) -> str:
    """Best-scoring stopword profile; 'und' (undetermined) when nothing hits."""
    words = text.lower().split()
    if not words:
        return "und"
    best_lang, best_hits = "und", 0
    for lang, profile in sorted(LANG_PROFILES.items()):
        hits = sum(1 for w in words if w in profile)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang


def bpe_ish_token_count(text: str) -> int:
    """Regex token count approximating a BPE pre-tokenizer's word/number/
    punctuation split (whitespace tokens alone undercount code/punct)."""
    return len(TOKEN_RE.findall(text))


def quality_frame(texts: pl.Series) -> pl.DataFrame:
    """Vectorized quality features for a batch of documents:
    n_tokens, n_distinct, type-token ratio, mean word length, alpha ratio."""
    df = pl.DataFrame({"text": texts})
    words = pl.col("text").str.split(" ")
    out = df.select(
        n_tokens=words.list.len().cast(pl.Int64),
        n_distinct=words.list.n_unique().cast(pl.Int64),
        text_len=pl.col("text").str.len_chars().cast(pl.Int64),
    ).with_columns(
        # single int/int division: bit-identical across engines, no rounding
        # needed (and rounding would hit genuine half-ties like 27/96)
        ttr=(pl.col("n_distinct") / pl.col("n_tokens")).cast(pl.Float64),
        mean_word_len=(
            (pl.col("text_len") - pl.col("n_tokens") + 1) / pl.col("n_tokens")
        ).round(4).cast(pl.Float32),
    )
    return out


def stopword_ratio(text: str, lang: str = "en") -> float:
    words = text.lower().split()
    if not words:
        return 0.0
    profile = LANG_PROFILES.get(lang, LANG_PROFILES["en"])
    return sum(1 for w in words if w in profile) / len(words)


def quality_score(text: str, lang: str = "en") -> float:
    """Composite [0,1] quality heuristic: length, lexical diversity, stopword
    presence (Gopher/C4-style filters collapsed to one score)."""
    words = text.split()
    n = len(words)
    if n == 0:
        return 0.0
    length_term = min(1.0, n / 50.0)
    ttr = len(set(words)) / n
    sw = stopword_ratio(text, lang)
    sw_term = min(1.0, sw / 0.08)
    return round(0.4 * length_term + 0.3 * ttr + 0.3 * sw_term, 4)


def rolling_fingerprints(text: str, window: int = 8, keep_mod: int = 16) -> np.ndarray:
    """Winnowing-style document fingerprints: rolling hash over word windows,
    keep hashes ≡ 0 (mod keep_mod) — a position-robust containment signature."""
    from qwen_ocr_ray.functions.text_hash import word_hashes, _SHINGLE_A

    w = word_hashes(text)
    if len(w) < window:
        return np.unique(w)
    acc = w[: len(w) - window + 1].copy()
    for i in range(1, window):
        acc = acc * _SHINGLE_A + w[i : len(w) - window + 1 + i]
    kept = acc[acc % np.uint64(keep_mod) == 0]
    return np.unique(kept)
