"""Host-side tokenizers for the frozen text towers.

Capability parity with the reference's tokenizer assets
(models/BiomedCLIP/tokenizer.py: SimpleTokenizer BPE for CLIP,
HFTokenizer/BertTokenizer WordPiece for BiomedCLIP). Tokenisation is cold-path
host work — there are only five fixed prompts (config.yml:15-21) — so these
are plain Python, run once at model build, and the resulting int32 id arrays
are baked into the jitted graph.

Both tokenizers load their vocab from a user-supplied path. When no vocab
asset is available (the reference ships the files but not the weights), a
deterministic hash fallback keeps the full pipeline runnable: ids are stable
across processes, which is all the frozen randomly-initialised tower needs.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import re

import numpy as np


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
    cand = os.path.join(_REFERENCE_ASSET_DIR, name)
    return cand if os.path.isfile(cand) else None


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


class ClipBPETokenizer:
    """CLIP byte-pair tokenizer: <SOT> bpe(text) <EOT>, padded to
    ``context_length`` (SimpleTokenizer semantics; CLIP text tower context 42,
    drift_noise_model.py:80). Loads the gzip merges vocab when available."""

    def __init__(self, bpe_path: str | None = None, context_length: int = 42,
                 vocab_size: int = 49408):
        self.context_length = context_length
        self.vocab_size = vocab_size
        self.sot_id = vocab_size - 2
        self.eot_id = vocab_size - 1
        self.encoder = None
        self.bpe_ranks = None
        if bpe_path and os.path.isfile(bpe_path):
            with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
                merges = f.read().split("\n")[1 : 49152 - 256 - 2 + 1]
            merges = [tuple(m.split()) for m in merges if m]
            chars = _bytes_to_unicode_values()
            vocab = list(chars) + [c + "</w>" for c in chars]
            for m in merges:
                vocab.append("".join(m))
            vocab.extend(["<|startoftext|>", "<|endoftext|>"])
            self.encoder = {tok: i for i, tok in enumerate(vocab)}
            self.bpe_ranks = {m: i for i, m in enumerate(merges)}
            self.byte_encoder = _bytes_to_unicode()

    def _bpe(self, token: str):
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
        return word

    def _encode_word(self, word: str):
        if self.encoder is None:
            return [_hash_id(word, self.vocab_size - 2, reserved=1)]
        btext = "".join(self.byte_encoder[b] for b in word.encode("utf-8"))
        return [self.encoder.get(t, 0) for t in self._bpe(btext)]

    def __call__(self, texts):
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), self.context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot_id]
            for w in _basic_tokenize(text):
                ids.extend(self._encode_word(w))
            ids = ids[: self.context_length - 1] + [self.eot_id]
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
