"""HuggingFace tokenizer wrapper (reference tokenizer.py:403-521).

Wraps transformers AutoTokenizer for HF text towers (PubMedBERT for
BiomedCLIP); numpy int32 output with the same cleaning options as the BPE
tokenizer. SigLipTokenizer variant handles the T5/mT5 sentencepiece vocabs.
"""

from __future__ import annotations

import warnings
from typing import List, Optional, Union

import numpy as np

from xtagclip_tpu.tokenize.bpe import DEFAULT_CONTEXT_LENGTH, get_clean_fn


class HFTokenizer:
    def __init__(
        self,
        tokenizer_name: str,
        context_length: Optional[int] = DEFAULT_CONTEXT_LENGTH,
        clean: str = "whitespace",
        strip_sep_token: bool = False,
        language: Optional[str] = None,
        **kwargs,
    ):
        from transformers import AutoTokenizer

        name = tokenizer_name.replace("hf-hub:", "")
        self.tokenizer = AutoTokenizer.from_pretrained(name, **kwargs)
        set_lang_fn = getattr(self.tokenizer, "set_src_lang_special_tokens", None)
        if callable(set_lang_fn):
            self.set_lang_fn = set_lang_fn
            if language is not None:
                self.set_language(language)
        self.context_length = context_length
        self.clean_fn = get_clean_fn(clean)
        self.strip_sep_token = strip_sep_token

    def save_pretrained(self, dest):
        self.tokenizer.save_pretrained(dest)

    def __call__(self, texts: Union[str, List[str]],
                 context_length: Optional[int] = None) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        assert context_length, "Please set a valid context length"
        texts = [self.clean_fn(t) for t in texts]
        out = self.tokenizer.batch_encode_plus(
            texts,
            return_tensors="np",
            max_length=context_length,
            padding="max_length",
            truncation=True,
        ).input_ids
        if self.strip_sep_token:
            sep = self.tokenizer.sep_token_id
            out = np.where(out == sep, np.zeros_like(out), out)
        return out.astype(np.int32)

    def set_language(self, src_lang):
        if hasattr(self, "set_lang_fn"):
            self.set_lang_fn(src_lang)
        else:
            warnings.warn("Cannot set language for the tokenizer.")


class SigLipTokenizer(HFTokenizer):
    """SigLIP T5-based tokenizer (reference tokenizer.py:464-521): canonical
    cleaning, pad-to-max with EOS."""

    VOCAB_FILES = {
        "c4-en": "c4_en_301_5sentencepiece.model",
        "mc4": "sentencepiece.model",
    }

    def __init__(self, tokenizer_name: str,
                 context_length: Optional[int] = 64):
        from transformers import T5TokenizerFast

        name = tokenizer_name.replace("hf-hub:", "")
        self.tokenizer = T5TokenizerFast.from_pretrained(name)
        self.context_length = context_length
        self.clean_fn = get_clean_fn("canonicalize")
        self.strip_sep_token = False

    def __call__(self, texts, context_length: Optional[int] = None):
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        texts = [self.clean_fn(t) for t in texts]
        out = self.tokenizer(
            texts, return_tensors="np", max_length=context_length,
            padding="max_length", truncation=True,
        ).input_ids
        return out.astype(np.int32)
