"""Host-side tokenizers for the frozen text towers.

Capability parity with the reference's tokenizer assets
(models/BiomedCLIP/tokenizer.py: SimpleTokenizer BPE for CLIP,
HFTokenizer/BertTokenizer WordPiece for BiomedCLIP, SigLipTokenizer,
clean fns :65-123, reduction-mask variants :273-394). Tokenisation is
cold-path host work — there are only five fixed prompts (config.yml:15-21) —
so these are plain Python, run once at model build, and the resulting int32
id arrays are baked into the jitted graph.

Both tokenizers load their vocab from a user-supplied path. When no vocab
asset is available (the reference ships the files but not the weights), a
deterministic hash fallback keeps the full pipeline runnable: ids are stable
across processes, which is all the frozen randomly-initialised tower needs.
"""

from __future__ import annotations

import gzip
import hashlib
import html
import os
import re
import string
from functools import partial

import numpy as np

try:  # mojibake repair; absent in this image — identity keeps parity testable
    import ftfy as _ftfy

    _fix_text = _ftfy.fix_text
except Exception:  # pragma: no cover - environment-dependent
    def _fix_text(s: str) -> str:
        return s


# ---------------------------------------------------------------------------
# Text cleaning (reference tokenizer.py:65-123)
# ---------------------------------------------------------------------------

def basic_clean(text: str) -> str:
    """ftfy fix + double html-unescape + strip (reference tokenizer.py:65-68)."""
    text = _fix_text(text)
    return html.unescape(html.unescape(text)).strip()


def whitespace_clean(text: str) -> str:
    """Collapse runs of whitespace (reference tokenizer.py:71-74)."""
    return re.sub(r"\s+", " ", text).strip()


def canonicalize_text(text: str, *, keep_punctuation_exact_string: str | None = None) -> str:
    """Lowercase + strip punctuation (big_vision prompt canonicalisation;
    reference tokenizer.py:103-123). ``keep_punctuation_exact_string`` keeps
    exact occurrences of that string while still removing its characters when
    they appear separately."""
    text = text.replace("_", " ")
    strip_punct = str.maketrans("", "", string.punctuation)
    if keep_punctuation_exact_string:
        text = keep_punctuation_exact_string.join(
            part.translate(strip_punct)
            for part in text.split(keep_punctuation_exact_string))
    else:
        text = text.translate(strip_punct)
    return re.sub(r"\s+", " ", text.lower()).strip()


def _clean_canonicalize(x: str) -> str:
    return canonicalize_text(basic_clean(x))


def _clean_lower(x: str) -> str:
    return whitespace_clean(basic_clean(x)).lower()


def _clean_whitespace(x: str) -> str:
    return whitespace_clean(basic_clean(x))


def get_clean_fn(type: str):
    """Registry of text-clean strategies (reference tokenizer.py:92-100)."""
    if type == "canonicalize":
        return _clean_canonicalize
    if type == "lower":
        return _clean_lower
    if type == "whitespace":
        return _clean_whitespace
    raise AssertionError(f"Invalid clean function ({type}).")


# ---------------------------------------------------------------------------
# Reduction-mask tokenize strategies (reference tokenizer.py:273-394).
# NumPy re-designs with EXPLICIT rng (jax-style reproducibility) instead of
# torch/random global state; output contract (shapes, sot/eot placement,
# truncation semantics) matches the reference exactly.
# ---------------------------------------------------------------------------

def random_mask_tokenize(texts, context_length: int, sot_token_id: int,
                         eot_token_id: int, encode_fn, shuffle: bool = False,
                         rng: np.random.Generator | None = None) -> np.ndarray:
    """Randomly DROP tokens down to the context budget, keeping original order
    unless ``shuffle`` (reference tokenizer.py:273-299)."""
    rng = rng or np.random.default_rng()
    if isinstance(texts, str):
        texts = [texts]
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        tokens = np.asarray(encode_fn(text), dtype=np.int32)
        num_tokens = len(tokens)
        if num_tokens > context_length - 2:  # 2 slots for sot and eot
            num_keep = context_length - 2
            indices = rng.permutation(num_tokens)[:num_keep]
            if not shuffle:
                indices = np.sort(indices)
            tokens = tokens[indices]
            num_tokens = num_keep
        result[i, 0] = sot_token_id
        result[i, 1:num_tokens + 1] = tokens
        result[i, num_tokens + 1] = eot_token_id
    return result


def simple_mask_tokenize(texts, context_length: int, sot_token_id: int,
                         eot_token_id: int, encode_fn,
                         rng: np.random.Generator | None = None) -> np.ndarray:
    """Keep one random CONTIGUOUS block of the token stream
    (reference tokenizer.py:302-321)."""
    rng = rng or np.random.default_rng()
    if isinstance(texts, str):
        texts = [texts]
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        tokens = list(encode_fn(text))
        num_tokens = len(tokens)
        if num_tokens > context_length - 2:
            num_keep = context_length - 2
            start = int(rng.integers(0, num_tokens - num_keep + 1))  # high incl
            tokens = tokens[start:start + num_keep]
        tokens = [sot_token_id] + tokens + [eot_token_id]
        result[i, :len(tokens)] = tokens
    return result


_POS_SUFFIX_RULES = (
    # (suffix, tag) heuristics for the offline fallback tagger; enough to
    # preserve the reference's noun>adj>verb priority on domain prompts.
    ("ing", "VBG"), ("ed", "VBD"), ("ly", "RB"), ("ous", "JJ"), ("ful", "JJ"),
    ("ive", "JJ"), ("able", "JJ"), ("al", "JJ"), ("ian", "JJ"),
)


def _heuristic_pos_tag(text: str):
    """Offline stand-in for ``nltk.pos_tag(word_tokenize(text))`` — this image
    has no nltk corpora and zero egress. Suffix heuristics + a small closed-
    class list; defaults to NN so content words win the syntax priority."""
    closed = {"in", "of", "the", "a", "an", "and", "or", "with", "on", "to",
              "is", "are", "was", "were", "at", "by", "for", "from"}
    out = []
    for tok in text.split():
        low = tok.lower()
        if low in closed:
            out.append((tok, "IN"))
            continue
        for suf, tag in _POS_SUFFIX_RULES:
            if low.endswith(suf) and len(low) > len(suf) + 1:
                out.append((tok, tag))
                break
        else:
            out.append((tok, "NN"))
    return out


def _default_tagger(text: str):
    try:  # real nltk path when its corpora are installed
        import nltk

        toks = nltk.tokenize.word_tokenize(text)
        return nltk.pos_tag(toks)
    except Exception:
        return _heuristic_pos_tag(text)


def syntax_mask_tokenize(texts, context_length: int, sot_token_id: int,
                         eot_token_id: int, encode_fn,
                         tagger=None) -> np.ndarray:
    """Drop tokens prioritised by part of speech — keep nouns, then
    adjectives, then verbs (reference tokenizer.py:324-380). ``tagger`` maps a
    text to ``[(token, pos_tag), ...]``; defaults to nltk when its corpora are
    available, else a deterministic suffix-heuristic tagger."""
    tagger = tagger or _default_tagger
    if isinstance(texts, str):
        texts = [texts]

    def get_order(tag: str) -> int:
        if tag.startswith("NN"):
            return 1
        if tag.startswith("JJ"):
            return 2
        if tag.startswith("VB"):
            return 3
        return 4

    new_texts = []
    for text in texts:
        tagged = tagger(text)
        order = np.array([get_order(tag) for _, tag in tagged])
        sorted_ids = np.argsort(order)  # same tie-break as the reference
        sampled_ids = sorted(sorted_ids[:context_length - 2])
        new_texts.append(" ".join(tagged[j][0] for j in sampled_ids))

    result = np.zeros((len(new_texts), context_length), dtype=np.int32)
    for i, text in enumerate(new_texts):
        tokens = [sot_token_id] + list(encode_fn(text)) + [eot_token_id]
        if len(tokens) > context_length:  # some words produce two tokens
            tokens = tokens[:context_length]
            tokens[-1] = eot_token_id
        result[i, :len(tokens)] = tokens
    return result


def get_reduction_mask_fn(type: str):
    """Strategy registry for dropping tokens to the context budget
    (reference tokenizer.py:383-393)."""
    assert type in ("simple", "random", "shuffle", "syntax")
    if type == "simple":
        return simple_mask_tokenize        # random contiguous block
    if type == "random":
        return random_mask_tokenize        # random drop, keep order
    if type == "shuffle":
        return partial(random_mask_tokenize, shuffle=True)
    return syntax_mask_tokenize            # drop prioritised by syntax


def _hash_id(token: str, vocab_size: int, reserved: int = 10) -> int:
    h = int.from_bytes(hashlib.sha256(token.encode()).digest()[:4], "little")
    return reserved + (h % (vocab_size - reserved))


_WORD_RE = re.compile(r"[a-z0-9]+|[^\sa-z0-9]")

# The reference ships its tokenizer data (vocab.txt for WordPiece,
# bpe_simple_vocab_16e6.txt.gz for CLIP BPE) even though weights are
# unreleased; auto-discover them like get_BiomedCLIP does (biomedclip.py).
_REFERENCE_ASSET_DIR = "/root/reference/models/BiomedCLIP"


def default_vocab_path(kind: str) -> str | None:
    """Path to the reference's shipped vocab asset for tokenizer ``kind``
    ('bert' -> vocab.txt, 'bpe' -> bpe_simple_vocab_16e6.txt.gz), or None
    when absent (hash fallback then applies)."""
    name = "vocab.txt" if kind == "bert" else "bpe_simple_vocab_16e6.txt.gz"
    for sub in ("", "BiomedCLIP"):  # the gz ships in the nested package dir
        cand = os.path.join(_REFERENCE_ASSET_DIR, sub, name)
        if os.path.isfile(cand):
            return cand
    return None


def _basic_tokenize(text: str):
    return _WORD_RE.findall(text.lower())


class BertWordPieceTokenizer:
    """WordPiece with BERT special tokens: [CLS] text [SEP], padded to
    ``context_length`` (BiomedCLIP text tower, context 256,
    BiomedCLIP_config.json:17)."""

    def __init__(self, vocab_path: str | None = None, context_length: int = 256,
                 vocab_size: int = 30522):
        self.context_length = context_length
        self.vocab = None
        self.vocab_size = vocab_size
        if vocab_path and os.path.isfile(vocab_path):
            with open(vocab_path, encoding="utf-8") as f:
                self.vocab = {line.rstrip("\n"): i for i, line in enumerate(f)}
            self.vocab_size = len(self.vocab)
        if self.vocab is not None:
            self.cls_id = self.vocab.get("[CLS]", 2)
            self.sep_id = self.vocab.get("[SEP]", 3)
            self.pad_id = self.vocab.get("[PAD]", 0)
            self.unk_id = self.vocab.get("[UNK]", 1)
        else:
            self.pad_id, self.unk_id, self.cls_id, self.sep_id = 0, 1, 2, 3

    def _wordpiece(self, word: str):
        if self.vocab is None:
            return [_hash_id(word, self.vocab_size)]
        if word in self.vocab:
            return [self.vocab[word]]
        ids, start = [], 0
        while start < len(word):
            end, cur = len(word), None
            while start < end:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in self.vocab:
                    cur = self.vocab[piece]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            ids.append(cur)
            start = end
        return ids

    def __call__(self, texts):
        if isinstance(texts, str):
            texts = [texts]
        out = np.full((len(texts), self.context_length), self.pad_id, dtype=np.int32)
        mask = np.zeros((len(texts), self.context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [self.cls_id]
            for w in _basic_tokenize(text):
                ids.extend(self._wordpiece(w))
            ids = ids[: self.context_length - 1] + [self.sep_id]
            out[i, : len(ids)] = ids
            mask[i, : len(ids)] = 1
        return out, mask


def _clip_word_pattern(special_tokens):
    """The CLIP pre-tokenizer split pattern (reference tokenizer.py:153-156);
    needs the ``regex`` module for \\p classes — None when unavailable and the
    simpler ``_WORD_RE`` fallback applies."""
    try:
        import regex
    except Exception:  # pragma: no cover - regex ships with this image
        return None
    special = "|".join(re.escape(t) for t in special_tokens)
    return regex.compile(
        special + r"""|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
        regex.IGNORECASE,
    )


class ClipBPETokenizer:
    """CLIP byte-pair tokenizer: <SOT> bpe(text) <EOT>, padded to
    ``context_length`` (SimpleTokenizer semantics, reference
    tokenizer.py:126-258; CLIP text tower context 42,
    drift_noise_model.py:80). Loads the gzip merges vocab when available and
    then splits text with the reference's exact pattern; supports the
    reference's ``clean`` / ``reduction_mask`` / ``additional_special_tokens``
    options."""

    def __init__(self, bpe_path: str | None = None, context_length: int = 42,
                 vocab_size: int = 49408, clean: str = "lower",
                 reduction_mask: str = "",
                 additional_special_tokens: list[str] | None = None):
        self.context_length = context_length
        self.vocab_size = vocab_size
        self.encoder = None
        self.bpe_ranks = None
        self.clean_fn = get_clean_fn(clean)
        self.reduction_fn = (get_reduction_mask_fn(reduction_mask)
                             if reduction_mask else None)
        special_tokens = ["<start_of_text>", "<end_of_text>"]
        if additional_special_tokens:
            special_tokens += additional_special_tokens
        if bpe_path and os.path.isfile(bpe_path):
            with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
                merges = f.read().split("\n")[1 : 49152 - 256 - 2 + 1]
            merges = [tuple(m.split()) for m in merges if m]
            chars = _bytes_to_unicode_values()
            vocab = list(chars) + [c + "</w>" for c in chars]
            for m in merges:
                vocab.append("".join(m))
            vocab.extend(special_tokens)
            self.encoder = {tok: i for i, tok in enumerate(vocab)}
            self.decoder = {i: tok for tok, i in self.encoder.items()}
            self.bpe_ranks = {m: i for i, m in enumerate(merges)}
            self.byte_encoder = _bytes_to_unicode()
            self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
            self.vocab_size = len(self.encoder)
            self.sot_id = self.encoder[special_tokens[0]]
            self.eot_id = self.encoder[special_tokens[1]]
            self._special = set(special_tokens)
            self._cache = {}
            self._pat = _clip_word_pattern(special_tokens)
        else:
            self.sot_id = vocab_size - 2
            self.eot_id = vocab_size - 1
            self._pat = None

    def _bpe(self, token: str):
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1e10))
            if best not in self.bpe_ranks:
                break
            first, second = best
            new_word, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        self._cache[token] = list(word)
        return word

    def _encode_word(self, word: str):
        if self.encoder is None:
            return [_hash_id(word, self.vocab_size - 2, reserved=1)]
        if word in self._special:
            return [self.encoder[word]]
        btext = "".join(self.byte_encoder[b] for b in word.encode("utf-8"))
        return [self.encoder.get(t, 0) for t in self._bpe(btext)]

    def encode(self, text: str):
        """Clean + split + BPE one string to a list of ids (no sot/eot)."""
        text = self.clean_fn(text)
        if self._pat is not None:
            words = self._pat.findall(text)
        else:
            words = _WORD_RE.findall(text.lower())
        ids = []
        for w in words:
            ids.extend(self._encode_word(w))
        return ids

    def decode(self, tokens) -> str:
        """Ids back to text (reference tokenizer.py:214-217)."""
        if self.encoder is None:
            raise ValueError("decode requires a real BPE vocab")
        text = "".join(self.decoder[int(t)] for t in tokens)
        raw = bytearray(self.byte_decoder[c] for c in text if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def __call__(self, texts, context_length: int | None = None):
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        if self.reduction_fn is not None:
            return self.reduction_fn(
                texts, context_length=context_length,
                sot_token_id=self.sot_id, eot_token_id=self.eot_id,
                encode_fn=self.encode)
        out = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot_id] + self.encode(text) + [self.eot_id]
            if len(ids) > context_length:  # truncate, force-close with eot
                ids = ids[:context_length]
                ids[-1] = self.eot_id
            out[i, : len(ids)] = ids
        return out


class SigLipTokenizer:
    """SigLIP text tokenizer semantics (reference tokenizer.py:443-496):
    canonicalize-clean the text, sentencepiece-encode, pad/eos id both 1,
    fixed ``context_length`` (default 64).

    The reference wraps HF ``T5TokenizerFast`` over a downloaded
    sentencepiece model; this image has zero egress and no sentencepiece, so
    a real vocab is used only when a local HF tokenizer dir/file is supplied
    AND loadable; otherwise a deterministic hash fallback keeps the contract
    (cleaning, eos placement, padding) testable offline."""

    def __init__(self, tokenizer_name: str | None = None,
                 context_length: int = 64, vocab_size: int = 32000):
        self.context_length = context_length
        self.vocab_size = vocab_size
        self.pad_id = 1
        self.eos_id = 1
        self.tokenizer = None
        if tokenizer_name and os.path.exists(tokenizer_name):
            try:
                from transformers import T5TokenizerFast

                self.tokenizer = T5TokenizerFast(tokenizer_name, legacy=False)
                self.tokenizer.pad_token_id = 1
                self.tokenizer.eos_token_id = 1
            except Exception:
                self.tokenizer = None

    def __call__(self, texts, context_length: int | None = None) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        texts = [canonicalize_text(basic_clean(t)) for t in texts]
        if self.tokenizer is not None:
            out = self.tokenizer(
                texts, return_tensors="np", max_length=context_length,
                padding="max_length", truncation=True)
            return out.input_ids.astype(np.int32)
        out = np.full((len(texts), context_length), self.pad_id, dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [_hash_id(w, self.vocab_size, reserved=2) for w in text.split()]
            ids = ids[: context_length - 1] + [self.eos_id]
            out[i, : len(ids)] = ids
        return out


def _bytes_to_unicode():
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(ord("\xa1"), ord("\xac") + 1)) + list(
        range(ord("\xae"), ord("\xff") + 1)
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _bytes_to_unicode_values():
    return list(_bytes_to_unicode().values())
