"""Prompt table: splice-tokenization must equal direct tokenization, and the
combo indexing must round-trip the reference template rendering."""

import itertools

import numpy as np

from xtagclip_tpu.models.clip import TAG_CATEGORY_OFFSETS, TAG_CATEGORY_SIZES, combo_index
from xtagclip_tpu.tokenize.bpe import SimpleTokenizer
from xtagclip_tpu.tokenize.prompts import (
    PromptTable,
    render_prompt,
    tag_indices_to_words,
    TEMPLATE_ORDER,
)
from xtagclip_tpu.utils.assets import read_tag_list

CLASS_WORDS = ["Others", "Hypertrophic scar", "Keloid scar"]


def test_table_shape():
    pt = PromptTable(CLASS_WORDS)
    assert pt.table.shape == (5, 3, 2304, 77)
    assert pt.table.dtype == np.int32


def test_splice_equals_direct_tokenization():
    pt = PromptTable(CLASS_WORDS)
    tok = SimpleTokenizer()
    tags = read_tag_list()
    rng = np.random.default_rng(0)
    for _ in range(25):
        ti = int(rng.integers(5))
        ci = int(rng.integers(3))
        choice = [int(rng.integers(s)) for s in TAG_CATEGORY_SIZES]
        chosen_tags = [
            tags[TAG_CATEGORY_OFFSETS[c] + choice[c]] for c in range(6)
        ]
        text = render_prompt(TEMPLATE_ORDER[ti], CLASS_WORDS[ci], chosen_tags)
        direct = tok([text])[0]
        combo = int(combo_index(np.asarray([choice]))[0])
        np.testing.assert_array_equal(
            pt.table[ti, ci, combo], direct,
            err_msg=f"template={TEMPLATE_ORDER[ti]} text={text!r}",
        )


def test_combo_index_bijective():
    seen = set()
    for choice in itertools.product(*[range(s) for s in TAG_CATEGORY_SIZES]):
        seen.add(int(combo_index(np.asarray([choice]))[0]))
    assert seen == set(range(2304))


def test_tag_indices_to_words_format():
    idx = np.asarray([[0, 3, 7, 10, 14, 18]])
    words = tag_indices_to_words(idx)
    assert words[0].startswith("Linear Width,Normal Color,")
    assert len(words[0].split(",")) == 6


def test_prompt_table_tokenizer_agnostic_fallback():
    """A tokenizer WITHOUT .encode/.sot_token_id (the HFTokenizer surface —
    only __call__ + context_length) must still build the table, via full
    per-prompt tokenization (regression: BiomedCLIP --use-tagging crashed
    with AttributeError at startup). Using SimpleTokenizer.__call__ as the
    opaque tokenizer also proves the fallback equals the spliced table."""
    from xtagclip_tpu.tokenize.bpe import SimpleTokenizer
    from xtagclip_tpu.tokenize.prompts import PromptTable

    class OpaqueTokenizer:
        def __init__(self):
            self._t = SimpleTokenizer()
            self.context_length = self._t.context_length

        def __call__(self, texts):
            return self._t(texts)

    classes = ["Others"]
    spliced = PromptTable(classes, SimpleTokenizer(),
                          templates=["itemization"])
    full = PromptTable(classes, OpaqueTokenizer(), templates=["itemization"])
    assert full.table.shape == spliced.table.shape
    np.testing.assert_array_equal(full.table, spliced.table)
