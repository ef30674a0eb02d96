"""CLIPA token-reduction tokenization strategies (reference tokenizer.py:280-400):
simple (random contiguous block), random (random subset, order kept), shuffle
(random subset, order shuffled), syntax (keep nouns > adjectives > verbs via
nltk POS tags when available; graceful fallback otherwise). numpy outputs.
"""

from __future__ import annotations

import random as _random
from functools import partial
from typing import Callable, List, Union

import numpy as np

_nltk_ready = False


def random_mask_tokenize(texts, context_length: int, sot_token_id: int,
                         eot_token_id: int, encode_fn: Callable,
                         shuffle: bool = False) -> np.ndarray:
    if isinstance(texts, str):
        texts = [texts]
    result = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        tokens = np.asarray(encode_fn(text), np.int32)
        num = len(tokens)
        if num > context_length - 2:
            keep = context_length - 2
            idx = np.random.permutation(num)[:keep]
            if not shuffle:
                idx = np.sort(idx)
            tokens = tokens[idx]
            num = keep
        result[i, 0] = sot_token_id
        result[i, 1 : num + 1] = tokens
        result[i, num + 1] = eot_token_id
    return result


def simple_mask_tokenize(texts, context_length: int, sot_token_id: int,
                         eot_token_id: int, encode_fn: Callable) -> np.ndarray:
    if isinstance(texts, str):
        texts = [texts]
    result = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        tokens = list(encode_fn(text))
        num = len(tokens)
        if num > context_length - 2:
            keep = context_length - 2
            start = _random.randint(0, num - keep)
            tokens = tokens[start : start + keep]
        row = [sot_token_id] + tokens + [eot_token_id]
        result[i, : len(row)] = row
    return result


def _get_order(tag: str) -> int:
    if tag.startswith("NN"):
        return 1
    if tag.startswith("JJ"):
        return 2
    if tag.startswith("VB"):
        return 3
    return 4


def syntax_mask_tokenize(texts, context_length: int, sot_token_id: int,
                         eot_token_id: int, encode_fn: Callable) -> np.ndarray:
    if isinstance(texts, str):
        texts = [texts]
    global _nltk_ready
    try:
        import nltk

        if not _nltk_ready:
            try:
                nltk.data.find("tokenizers/punkt")
            except LookupError:
                nltk.download("punkt", quiet=True)
                nltk.download("averaged_perceptron_tagger", quiet=True)
            _nltk_ready = True
        have_nltk = True
    except ImportError:
        have_nltk = False

    new_texts = []
    for text in texts:
        if have_nltk:
            try:
                words = nltk.tokenize.word_tokenize(text)
                pos = nltk.pos_tag(words)
            except LookupError:
                have_nltk = False
                words, pos = text.split(), None
        else:
            words, pos = text.split(), None
        if pos is not None:
            order = [_get_order(t) for _, t in pos]
            keep_ids = sorted(np.argsort(np.asarray(order), kind="stable")
                              [: context_length - 2])
            words = [words[j] for j in keep_ids]
        else:  # fallback: plain front-truncation at the word level
            words = words[: context_length - 2]
        new_texts.append(" ".join(str(w) for w in words))

    result = np.zeros((len(new_texts), context_length), np.int32)
    for i, text in enumerate(new_texts):
        tokens = [sot_token_id] + list(encode_fn(text)) + [eot_token_id]
        if len(tokens) > context_length:
            tokens = tokens[:context_length]
            tokens[-1] = eot_token_id
        result[i, : len(tokens)] = tokens
    return result


def get_reduction_mask_fn(type: str):
    assert type in ("simple", "random", "shuffle", "syntax")
    if type == "simple":
        return simple_mask_tokenize
    if type == "random":
        return random_mask_tokenize
    if type == "shuffle":
        return partial(random_mask_tokenize, shuffle=True)
    return syntax_mask_tokenize
