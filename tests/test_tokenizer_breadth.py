"""Tokenizer breadth parity (VERDICT r3 item 5 / COMPONENTS §2.7).

Golden + property tests vs the reference's own executable tokenizer module
(/root/reference/models/BiomedCLIP/BiomedCLIP/tokenizer.py):

- clean fns (``basic_clean``/``whitespace_clean``/``canonicalize_text``/
  ``get_clean_fn``, reference :65-123) — exact string equality;
- ``SimpleTokenizer`` BPE ids — exact id-array equality incl. truncation,
  special tokens and decode round-trip;
- reduction-mask variants (``random/simple/shuffle/syntax``, reference
  :273-394) — exact equality where no RNG is consumed, output-contract
  properties where the reference burns global torch/random state;
- ``syntax_mask_tokenize`` — exact equality with an injected deterministic
  POS tagger on both sides (this image has no nltk corpora);
- ``SigLipTokenizer`` semantics (reference :443-496): canonicalize cleaning,
  pad==eos==1, fixed context.

The reference module imports ftfy (absent here): both sides degrade to an
identity ``fix_text``, so the comparison stays apples-to-apples.
"""

import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from instancediff_tpu.models.tokenizer import (  # noqa: E402
    ClipBPETokenizer,
    SigLipTokenizer,
    basic_clean,
    canonicalize_text,
    default_vocab_path,
    get_clean_fn,
    get_reduction_mask_fn,
    random_mask_tokenize,
    simple_mask_tokenize,
    syntax_mask_tokenize,
    whitespace_clean,
)

REF_TOKENIZER = "/root/reference/models/BiomedCLIP/BiomedCLIP/tokenizer.py"

PROMPTS = [
    "speckle in OCT",
    "speckle in ultra sound",
    "noise in cryo-EM image",
    "noise in low dose CT",
    "Gaussian noise in MRI",
]
HARD_TEXTS = PROMPTS + [
    "It's a   noisy2-D image &amp; 37dB PSNR!!",
    "<start_of_text> weird ünïcödé ™ text",
    "x" * 500,  # truncation path
    "",
    "under_score and&nbsp;entities &lt;tag&gt;",
]


@pytest.fixture(scope="module")
def ref_tok():
    if "ftfy" not in sys.modules:
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s
        ftfy.__spec__ = importlib.machinery.ModuleSpec("ftfy", None)
        sys.modules["ftfy"] = ftfy
    spec = importlib.util.spec_from_file_location("ref_tokenizer", REF_TOKENIZER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_clean_fns_golden(ref_tok):
    samples = ["A_b &amp;&amp; c!  d", "  x\t\ny ", "Don't stop.", "a{}b {} c{d}",
               "MiXeD   CaSe nbsp", ""]
    for kind in ("canonicalize", "lower", "whitespace"):
        theirs, ours = ref_tok.get_clean_fn(kind), get_clean_fn(kind)
        for s in samples:
            assert ours(s) == theirs(s), (kind, s)
    for s in samples:
        assert basic_clean(s) == ref_tok.basic_clean(s)
        assert whitespace_clean(s) == ref_tok.whitespace_clean(s)
        assert canonicalize_text(s) == ref_tok.canonicalize_text(s)
        assert canonicalize_text(s, keep_punctuation_exact_string="{}") == \
            ref_tok.canonicalize_text(s, keep_punctuation_exact_string="{}")
    with pytest.raises(AssertionError):
        get_clean_fn("nope")


@pytest.fixture(scope="module")
def bpe_pair(ref_tok):
    path = default_vocab_path("bpe")
    if path is None:
        pytest.skip("reference bpe vocab asset not on disk")
    return ref_tok.SimpleTokenizer(bpe_path=path), \
        ClipBPETokenizer(path, context_length=77)


def test_bpe_ids_golden(ref_tok, bpe_pair):
    ref, mine = bpe_pair
    np.testing.assert_array_equal(ref(HARD_TEXTS).numpy(), mine(HARD_TEXTS))
    # per-call context override, like the reference __call__
    np.testing.assert_array_equal(
        ref(PROMPTS, context_length=16).numpy(),
        mine(PROMPTS, context_length=16))


def test_bpe_decode_roundtrip(bpe_pair):
    ref, mine = bpe_pair
    for text in PROMPTS:
        ids = mine.encode(text.lower())
        assert mine.decode(ids) == ref.decode(ids)


def test_random_mask_exact_when_no_reduction_needed(ref_tok, bpe_pair):
    ref, mine = bpe_pair
    # short prompts consume no RNG → bit-exact vs the reference fns
    for fn_ref, fn_mine in ((ref_tok.random_mask_tokenize, random_mask_tokenize),
                            (ref_tok.simple_mask_tokenize, simple_mask_tokenize)):
        theirs = fn_ref(PROMPTS, context_length=32, sot_token_id=ref.sot_token_id,
                        eot_token_id=ref.eot_token_id, encode_fn=ref.encode)
        ours = fn_mine(PROMPTS, context_length=32, sot_token_id=mine.sot_id,
                       eot_token_id=mine.eot_id, encode_fn=mine.encode)
        np.testing.assert_array_equal(theirs.numpy(), ours)


def _long_tokens_case(mine):
    text = " ".join(["speckle gaussian noise cryo tomography"] * 12)
    return text, mine.encode(text)


def test_random_mask_reduction_properties(bpe_pair):
    _, mine = bpe_pair
    text, full = _long_tokens_case(mine)
    ctx = 16
    rng = np.random.default_rng(0)
    out = random_mask_tokenize([text], ctx, mine.sot_id, mine.eot_id,
                               mine.encode, rng=rng)
    assert out.shape == (1, ctx)
    assert out[0, 0] == mine.sot_id and out[0, ctx - 1] == mine.eot_id
    kept = list(out[0, 1:ctx - 1])
    # non-shuffle keeps original order: kept must be a subsequence of full
    it = iter(full)
    assert all(any(tok == x for x in it) for tok in kept)
    # reproducible under an explicit rng (jax-style, no global state)
    out2 = random_mask_tokenize([text], ctx, mine.sot_id, mine.eot_id,
                                mine.encode, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(out, out2)


def test_shuffle_variant_reorders(bpe_pair):
    _, mine = bpe_pair
    text, full = _long_tokens_case(mine)
    ctx = 16
    fn = get_reduction_mask_fn("shuffle")
    out = fn([text], context_length=ctx, sot_token_id=mine.sot_id,
             eot_token_id=mine.eot_id, encode_fn=mine.encode,
             rng=np.random.default_rng(3))
    kept = list(out[0, 1:ctx - 1])
    assert sorted(kept) != kept or len(set(kept)) <= 1  # order was shuffled
    assert set(kept) <= set(full)


def test_simple_mask_keeps_contiguous_block(bpe_pair):
    _, mine = bpe_pair
    text, full = _long_tokens_case(mine)
    ctx = 16
    out = simple_mask_tokenize([text], ctx, mine.sot_id, mine.eot_id,
                               mine.encode, rng=np.random.default_rng(7))
    kept = list(out[0, 1:ctx - 1])
    joined = ",".join(map(str, full))
    assert ",".join(map(str, kept)) in joined  # contiguous slice of the stream


def _fake_tagger_tags():
    return {"speckle": "NN", "noise": "NN", "image": "NN", "gaussian": "JJ",
            "low": "JJ", "dose": "NN", "scanned": "VBD", "denoising": "VBG",
            "restore": "VB"}


def test_syntax_mask_golden_with_injected_tagger(ref_tok, bpe_pair, monkeypatch):
    """Exact equality of the syntax-priority selection: both sides get the
    SAME deterministic tagger (nltk corpora are not installed offline)."""
    ref, mine = bpe_pair
    tags = _fake_tagger_tags()

    import nltk

    monkeypatch.setattr(nltk, "download", lambda *a, **k: None)
    monkeypatch.setattr(nltk.tokenize, "word_tokenize", lambda t: t.split())
    monkeypatch.setattr(nltk, "pos_tag",
                        lambda toks: [(t, tags.get(t, "IN")) for t in toks])
    monkeypatch.setattr(ref_tok, "_nltk_init", True, raising=False)

    def my_tagger(text):
        return [(t, tags.get(t, "IN")) for t in text.split()]

    texts = [
        " ".join(["gaussian noise image scanned restore low dose speckle"] * 4),
        "speckle in the low dose image",
    ]
    ctx = 12
    theirs = ref_tok.syntax_mask_tokenize(
        texts, context_length=ctx, sot_token_id=ref.sot_token_id,
        eot_token_id=ref.eot_token_id, encode_fn=ref.encode)
    ours = syntax_mask_tokenize(
        texts, context_length=ctx, sot_token_id=mine.sot_id,
        eot_token_id=mine.eot_id, encode_fn=mine.encode, tagger=my_tagger)
    np.testing.assert_array_equal(theirs.numpy(), ours)


def test_reduction_registry_matches_reference(ref_tok):
    for kind in ("simple", "random", "shuffle", "syntax"):
        assert get_reduction_mask_fn(kind) is not None
        assert ref_tok.get_reduction_mask_fn(kind) is not None
    with pytest.raises(AssertionError):
        get_reduction_mask_fn("bogus")


def test_tokenizer_reduction_mask_wiring():
    path = default_vocab_path("bpe")
    tok = ClipBPETokenizer(path, context_length=10, reduction_mask="random")
    out = tok([" ".join(["speckle noise gaussian"] * 10)])
    assert out.shape == (1, 10)
    assert out[0, 0] == tok.sot_id and out[0, 9] == tok.eot_id


def test_siglip_tokenizer_semantics():
    tok = SigLipTokenizer(None, context_length=8)
    out = tok(["Gaussian_noise &amp; CT!!", "speckle"])
    assert out.shape == (2, 8) and out.dtype == np.int32
    # canonicalize cleaning: punctuation/underscores removed, case-folded →
    # identical text tokenizes identically
    same = tok(["gaussian noise  ct"])
    np.testing.assert_array_equal(out[0], same[0])
    # SigLIP contract: pad id == eos id == 1; ids then eos, padded with 1
    row = out[1]
    assert row[1] == 1 and np.all(row[2:] == 1)  # "speckle" → 1 id + eos + pad
    # truncation force-closes with eos
    long = tok([" ".join(["speckle"] * 50)])[0]
    assert long[-1] == 1 and np.all(long[:-1] != 0)


def test_siglip_matches_reference_cleaning(ref_tok):
    # the reference cleans with canonicalize_text(basic_clean(x)) before
    # sentencepiece (tokenizer.py:488); assert our fallback applies the same
    s = "A_b &amp; C!!  d"
    assert canonicalize_text(basic_clean(s)) == \
        ref_tok.canonicalize_text(ref_tok.basic_clean(s))
