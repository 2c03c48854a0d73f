"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All stateful pieces (compiled regexes, stopword tables, n-gram profiles)
are actor-pool state built once per actor (``__init__``), vectorized
pandas/regex work per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# Character/word n-gram profiles for a lightweight language heuristic —
# top frequent function words per language (public knowledge).
_LANG_MARKERS: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "que"},
    "es": {"el", "la", "los", "las", "de", "y", "un", "una", "es", "que"},
    "de": {"der", "die", "das", "und", "ein", "eine", "ist", "nicht", "mit", "zu"},
}

_STOPWORDS = _LANG_MARKERS["en"]


class LangId:
    """n-gram/function-word language heuristic. CJK detection by unicode
    block ratio; European languages by marker-word overlap."""

    def __init__(self):
        self.word = re.compile(r"[^\W\d_]+", re.U)

    def classify(self, text: str) -> str:
        if not text:
            return "unknown"
        n_cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
        if n_cjk / max(len(text), 1) > 0.1:
            return "zh"
        toks = [t.lower() for t in self.word.findall(text)]
        if not toks:
            return "unknown"
        best, best_score = "unknown", 0.0
        tokset = toks[:200]
        for lang, markers in _LANG_MARKERS.items():
            score = sum(1 for t in tokset if t in markers) / len(tokset)
            if score > best_score:
                best, best_score = lang, score
        return best if best_score > 0.02 else "unknown"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["lang_pred"] = [self.classify(t) for t in batch["text"]]
        return batch


class QualityScore:
    """Length / punctuation / stopword-ratio quality features
    (the standard pre-training quality heuristics)."""

    def __init__(self):
        self.word = re.compile(r"[A-Za-z0-9_]+")
        self.punct = re.compile(r"[.,;:!?]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_chars = batch["text"].str.len().to_numpy()
        words = [self.word.findall(t) for t in batch["text"]]
        n_words = np.array([len(w) for w in words])
        mean_word_len = np.array([np.mean([len(x) for x in w]) if w else 0.0 for w in words])
        stop_ratio = np.array(
            [sum(1 for x in w if x.lower() in _STOPWORDS) / max(len(w), 1) for w in words]
        )
        punct_ratio = np.array([len(self.punct.findall(t)) for t in batch["text"]]) / np.maximum(
            n_chars, 1
        )
        batch["n_words"] = n_words
        batch["mean_word_len"] = np.round(mean_word_len, 6)
        batch["stop_ratio"] = np.round(stop_ratio, 6)
        batch["punct_ratio"] = np.round(punct_ratio, 6)
        # simple composite: long enough, some stopwords, not punctuation soup
        batch["quality"] = np.round(
            np.clip(n_words / 50.0, 0, 1) * 0.4
            + np.clip(stop_ratio * 5.0, 0, 1) * 0.4
            + (1.0 - np.clip(punct_ratio * 10.0, 0, 1)) * 0.2,
            6,
        )
        return batch


class TokenCount:
    """Whitespace tokens + a BPE-ish subword estimate (4 chars/token)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["ws_tokens"] = batch["text"].str.split().str.len().fillna(0).astype(np.int64)
        # floor division (not round) so the SQL oracle's FLOOR(len/4) matches
        batch["bpe_tokens_est"] = (batch["text"].str.len().fillna(0) // 4).astype(np.int64)
        return batch


class Fingerprint:
    """Rolling-hash (Rabin-Karp) document fingerprint: the minimum k
    window hashes — a winnowing-style sketch usable for containment."""

    def __init__(self, window: int = 16, keep: int = 8, base: int = 257, mod: int = (1 << 61) - 1):
        self.window = window
        self.keep = keep
        self.base = base
        self.mod = mod

    def fingerprint(self, text: str) -> list[int]:
        data = text.encode("utf-8", "ignore")
        w, b, m = self.window, self.base, self.mod
        if len(data) < w:
            data = data + b"\x00" * (w - len(data))
        h = 0
        top = pow(b, w - 1, m)
        hashes = []
        for i, ch in enumerate(data):
            if i < w:
                h = (h * b + ch) % m
                if i == w - 1:
                    hashes.append(h)
            else:
                h = ((h - data[i - w] * top) * b + ch) % m
                hashes.append(h)
        # distinct hashes: repetitive text repeats windows; the sketch
        # must still carry `keep` DIFFERENT windows
        return [x - (1 << 60) for x in sorted(set(hashes))[: self.keep]]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["fingerprint"] = [self.fingerprint(t) for t in batch["text"]]
        return batch


def lang_id(ds, concurrency=(1, 4)):
    return ds.map_batches(LangId, batch_format="pandas", batch_size=1024, concurrency=concurrency)


def quality_score(ds, concurrency=(1, 4)):
    return ds.map_batches(QualityScore, batch_format="pandas", batch_size=2048, concurrency=concurrency)


def token_count(ds, concurrency=(1, 4)):
    return ds.map_batches(TokenCount, batch_format="pandas", batch_size=4096, concurrency=concurrency)


def fingerprint(ds, concurrency=(1, 4)):
    return ds.map_batches(Fingerprint, batch_format="pandas", batch_size=1024, concurrency=concurrency)
