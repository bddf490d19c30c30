"""SaProt: structure-aware vocabulary masked LM (AA x 3Di tokens).

Semantics match the reference
(ref: proteingym/baselines/saprot/compute_fitness.py:17-75):

  - vocabulary: 5 specials + (seq char) x (3Di char) pairs laid out in
    contiguous 3Di blocks per seq char, seq chars include '#' (masked AA);
  - tokenization: token(i) = pair(aa_i, 3di_i) from the structure;
  - scoring: mask the AA half at every mutated position ('#'+3di), one
    forward, then p(aa=X at pos) = sum over the 21-wide 3Di block of
    softmax probs; score = sum log(p_mut / p_wt) (:43-55).

The trunk is the ESM2 transformer (models/esm2.py) with the enlarged
vocabulary; 3Di tokens come from ops/tridi.py (native foldseek
replacement) or any precomputed 3Di string.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from proteingym_tpu.models import esm2
from proteingym_tpu.ops.tridi import TRIDI_VOCAB

SEQ_CHARS = "ACDEFGHIKLMNPQRSTVWYX#"  # AA + unknown + masked-AA
N_SPECIALS = 5  # <cls> <pad> <eos> <unk> <mask>
BLOCK = len(TRIDI_VOCAB) + 1  # each seq char also pairs with masked-3Di '#'
STRUC_CHARS = TRIDI_VOCAB + "#"


class SaProtVocab:
    cls_idx, padding_idx, eos_idx, unk_idx, mask_idx = 0, 1, 2, 3, 4

    def __init__(self):
        self.pair_base = {}
        idx = N_SPECIALS
        for s in SEQ_CHARS:
            self.pair_base[s] = idx
            idx += BLOCK
        self.size = idx

    def pair_id(self, aa: str, tridi: str) -> int:
        aa = aa if aa in self.pair_base else "X"
        si = STRUC_CHARS.index(tridi) if tridi in STRUC_CHARS else BLOCK - 1
        return self.pair_base[aa] + si

    def tokenize(self, seq: str, struc: str) -> np.ndarray:
        assert len(seq) == len(struc)
        ids = [self.cls_idx]
        ids += [self.pair_id(a, s) for a, s in zip(seq, struc)]
        ids.append(self.eos_idx)
        return np.asarray(ids, dtype=np.int32)

    def aa_block(self, aa: str) -> slice:
        base = self.pair_base[aa if aa in self.pair_base else "X"]
        return slice(base, base + BLOCK)


VOCAB = SaProtVocab()


class SaProtFileVocab:
    """Vocabulary loaded from the published SaProt vocab.txt (shipped with
    every SaProt checkpoint), removing any guess about token order. The
    per-AA 21-wide 3Di blocks are contiguous in the published vocab — the
    reference relies on it (compute_fitness.py:47-51) and we assert it."""

    # foldseek 3Di letters in the reference's order (compute_fitness.py:14)
    struc_chars = "pynwrqhgdlvtmfsaeikc#"

    def __init__(self, path):
        toks = [l.strip() for l in open(path) if l.strip()]
        self.tok_to_idx = {t: i for i, t in enumerate(toks)}
        self.size = len(toks)
        self.cls_idx = self.tok_to_idx.get("<cls>", 0)
        self.padding_idx = self.tok_to_idx.get("<pad>", 1)
        self.eos_idx = self.tok_to_idx.get("<eos>", 2)
        self.unk_idx = self.tok_to_idx.get("<unk>", 3)
        self.mask_idx = self.tok_to_idx.get("<mask>", self.size - 1)
        for aa in "ACDEFGHIKLMNPQRSTVWY#":
            base = self.tok_to_idx.get(aa + self.struc_chars[0])
            if base is None:
                continue
            for j, sc in enumerate(self.struc_chars):
                tid = self.tok_to_idx.get(aa + sc)
                if tid is not None and tid != base + j:
                    raise ValueError(
                        f"vocab file breaks the contiguous 3Di-block "
                        f"assumption at {aa}{sc}"
                    )

    def pair_id(self, aa, tridi):
        tok = aa + (tridi if tridi in self.struc_chars else "#")
        if tok not in self.tok_to_idx:
            tok = "#" + (tridi if tridi in self.struc_chars else "#")
        return self.tok_to_idx.get(tok, self.unk_idx)

    def tokenize(self, seq, struc):
        assert len(seq) == len(struc)
        ids = [self.cls_idx]
        ids += [self.pair_id(a, s) for a, s in zip(seq, struc)]
        ids.append(self.eos_idx)
        return np.asarray(ids, dtype=np.int32)

    def aa_block(self, aa):
        base = self.tok_to_idx.get(aa + self.struc_chars[0])
        if base is None:
            base = self.tok_to_idx["#" + self.struc_chars[0]]
        return slice(base, base + len(self.struc_chars))


def convert_torch_state_dict(sd, config: esm2.EsmConfig):
    """SaProt ships fair-esm-format .pt checkpoints; the trunk is standard
    ESM2 with the enlarged vocabulary, so the ESM2 converter applies."""
    return esm2.convert_torch_state_dict(sd, config)


def saprot_config(preset: str = "saprot_650M") -> esm2.EsmConfig:
    base = {
        "saprot_35M": esm2.EsmConfig("saprot_35M", 12, 480, 20),
        "saprot_650M": esm2.EsmConfig("saprot_650M", 33, 1280, 20),
    }[preset]
    return dataclasses.replace(base, alphabet_size=VOCAB.size)


def score_mutants(
    params,
    config: esm2.EsmConfig,
    target_seq: str,
    struc_seq: str,
    mutants: Sequence[str],
    vocab=None,
    offset_idx: int = 1,
    batch_size: int = 8,
) -> np.ndarray:
    """Per-mutant masked forward + 3Di-block marginalization."""
    vocab = vocab or VOCAB
    rows = []
    for m in mutants:
        seq = list(target_seq)
        for tok in m.split(":"):
            pos = int(tok[1:-1]) - offset_idx
            if target_seq[pos] != tok[0]:
                raise ValueError(f"WT mismatch in {tok}")
            seq[pos] = "#"  # mask the AA half, keep the 3Di half
        rows.append(vocab.tokenize("".join(seq), struc_seq))
    T = max(len(r) for r in rows)
    out = np.zeros(len(mutants))

    from proteingym_tpu.models.esm_scoring import _cached_jit

    fwd = _cached_jit(esm2.make_apply_fn(config), "fwd_params")

    for s in range(0, len(rows), batch_size):
        blk = rows[s : s + batch_size]
        tok = np.full((len(blk), T), vocab.padding_idx, np.int32)
        for bi, r in enumerate(blk):
            tok[bi, : len(r)] = r
        logits = fwd(params, jnp.asarray(tok))
        probs = np.asarray(jax.nn.softmax(logits.astype(jnp.float32), -1))
        for bi, m in enumerate(mutants[s : s + len(blk)]):
            score = 0.0
            for tokm in m.split(":"):
                wt, pos, mt = tokm[0], int(tokm[1:-1]) - offset_idx, tokm[-1]
                p = probs[bi, pos + 1]  # +1 for CLS
                p_wt = p[vocab.aa_block(wt)].sum()
                p_mt = p[vocab.aa_block(mt)].sum()
                score += np.log(p_mt / max(p_wt, 1e-30))
            out[s + bi] = score
    return out


def score_assay_saprot(
    params,
    config: esm2.EsmConfig,
    target_seq: str,
    coords: Optional[np.ndarray],
    mutants: Sequence[str],
    struc_seq: Optional[str] = None,
    codebook: Optional[np.ndarray] = None,
    batch_size: int = 8,
    vocab=None,
) -> np.ndarray:
    """End-to-end: 3Di tokens from the backbone (or a given 3Di string) +
    masked scoring (ref calc_fitness :58-75)."""
    if struc_seq is None:
        from proteingym_tpu.ops.tridi import structure_letters

        struc_seq = structure_letters(coords, codebook)
    return score_mutants(
        params, config, target_seq, struc_seq, mutants,
        batch_size=batch_size, vocab=vocab,
    )
