"""CLIPA mask-reduction tokenization strategies."""

import numpy as np

from xtagclip_tpu.tokenize.bpe import SimpleTokenizer


def _tok(reduction):
    return SimpleTokenizer(context_length=12, reduction_mask=reduction)


LONG = ("a photo of a very large fluffy orange cat sitting on an old wooden "
        "table next to the window in the morning light")


def test_simple_mask():
    out = _tok("simple")([LONG])
    assert out.shape == (1, 12)
    assert out[0, 0] == 49406 and out[0, -1] == 49407
    assert (out[0, 1:-1] != 0).all()


def test_random_and_shuffle_masks():
    np.random.seed(0)
    base = SimpleTokenizer()
    full = set(base.encode(LONG))
    for mode in ("random", "shuffle"):
        out = _tok(mode)([LONG])
        assert out.shape == (1, 12)
        assert out[0, 0] == 49406 and out[0, 11] == 49407
        kept = set(int(t) for t in out[0, 1:11])
        assert kept <= full  # a subset of the original tokens


def test_syntax_mask_prioritizes_or_falls_back():
    out = _tok("syntax")([LONG])
    assert out.shape == (1, 12)
    assert out[0, 0] == 49406
    assert 49407 in out[0]


def test_short_text_unchanged():
    base = SimpleTokenizer(context_length=12)
    for mode in ("simple", "random"):
        got = _tok(mode)(["a photo of a cat"])
        np.testing.assert_array_equal(got, base(["a photo of a cat"]))
