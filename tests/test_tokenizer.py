import numpy as np
import pytest

from tris_tpu.tokenizer import ClipBPETokenizer, tokenize
from tris_tpu.tokenizer.bpe import EOT_TOKEN, SOT_TOKEN


@pytest.fixture(scope="module")
def tok():
    return ClipBPETokenizer()


def test_known_token_ids(tok):
    # Golden ids from the public OpenAI CLIP tokenizer for common words.
    assert tok.encode("a") == [320]
    assert tok.encode("the") == [518]
    assert tok.encode("a photo of a cat") == [320, 1125, 539, 320, 2368]
    assert tok.encode("man on the right") == [786, 525, 518, 1155]


def test_roundtrip(tok):
    for text in ["man on the right", "a red umbrella next to the dog", "woman in blue jacket, left"]:
        ids = tok.encode(text)
        # decode inserts spaces at word boundaries; id-level roundtrip is exact
        assert tok.encode(tok.decode(ids)) == ids


def test_case_and_whitespace_insensitive(tok):
    assert tok.encode("  The   CAT ") == tok.encode("the cat")


def test_tokenize_layout():
    arr = tokenize(["man on the right"], context_length=77)
    assert arr.shape == (1, 77)
    assert arr.dtype == np.int32
    assert arr[0, 0] == SOT_TOKEN
    n = 1 + 4  # sot + 4 word tokens
    assert arr[0, n] == EOT_TOKEN
    assert (arr[0, n + 1 :] == 0).all()


def test_tokenize_truncation():
    long = " ".join(["cat"] * 100)
    arr = tokenize(long, context_length=20)
    assert arr.shape == (1, 20)
    assert arr[0, 0] == SOT_TOKEN
    assert arr[0, -1] == EOT_TOKEN


def test_parity_with_reference_if_available(tok):
    """If the upstream tokenizer is importable, check exact id parity on a corpus."""
    import importlib.util
    import sys

    if importlib.util.find_spec("ftfy") is None:
        pytest.skip("ftfy not installed; reference tokenizer unavailable")
    sys.path.insert(0, "/root/reference")
    try:
        from CLIP.clip.simple_tokenizer import SimpleTokenizer
    except Exception:
        pytest.skip("reference tokenizer not importable")
    finally:
        sys.path.pop(0)
    ref = SimpleTokenizer()
    corpus = [
        "man on the right",
        "the skier in red, 2nd from left",
        "a zebra behind another zebra's head",
        "bottom-left sandwich half",
        "guy w/ glasses & hat",
    ]
    for text in corpus:
        assert tok.encode(text) == ref.encode(text)
