"""Scorer registrations for the extended model zoo.

Importing this module (pipeline/scorers.py does it at the bottom) makes
every extended family CLI-visible: carp, esmc, esm3, xtrimopglm, saprot,
esm_if1, protssn, mif, mulan, venusrem, aido, rsalor, vespag,
supervised ridge baselines, and kermut. Each follows the ScoreContext
contract (see pipeline/scorers.py).
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path

import numpy as np

from proteingym_tpu.data.mutants import is_wt_row
import pandas as pd

from proteingym_tpu.pipeline.scorers import (
    ScoreContext, _score_focus_model, register_scorer,
)


def _load_structure(ctx: ScoreContext):
    from proteingym_tpu.data.structures import parse_pdb_backbone

    if ctx.structure_dir is None:
        raise FileNotFoundError(f"{ctx.record.DMS_id}: needs --structure-dir")
    for stem in (ctx.record.UniProt_ID, ctx.record.DMS_id):
        pdb = Path(ctx.structure_dir) / f"{stem}.pdb"
        if pdb.exists():
            coords, _ = parse_pdb_backbone(pdb)
            return coords
    raise FileNotFoundError(f"No PDB for {ctx.record.DMS_id}")


def _with_column(ctx: ScoreContext, column: str, scores) -> pd.DataFrame:
    out = ctx.dms_frame.copy()
    out[column] = np.asarray(scores)
    return out


@register_scorer("carp")
def score_carp(ctx: ScoreContext) -> pd.DataFrame:
    """CARP ByteNet conv LM marginals (ref carp_mif/compute_fitness.py)."""
    from proteingym_tpu.models import carp
    from proteingym_tpu.pipeline.scorers import resolve_zoo_checkpoint

    config, params = resolve_zoo_checkpoint(
        ctx.checkpoint, carp.CARP_PRESETS, "carp_600k", carp.init_params,
        config_cls=carp.CarpConfig,
    )
    scores = carp.score_assay(
        params, config, ctx.record.target_seq,
        ctx.dms_frame["mutant"].tolist(),
        strategy=ctx.extra.get("scoring_strategy", "masked-marginals"),
        chunk=ctx.batch_size,
    )
    return _with_column(ctx, f"{config.name}_score", scores)


@register_scorer("esmc")
def score_esmc(ctx: ScoreContext) -> pd.DataFrame:
    """ESM-C sequence scoring (ref evoscale/compute_fitness.py)."""
    from proteingym_tpu.models import esmc
    from proteingym_tpu.pipeline.scorers import resolve_zoo_checkpoint

    config, params = resolve_zoo_checkpoint(
        ctx.checkpoint, esmc.PRESETS, "esmc_300m", esmc.init_params,
        config_cls=esmc.EsmcConfig,
    )
    scores = esmc.score_assay(
        params, config, ctx.record.target_seq,
        ctx.dms_frame["mutant"].tolist(),
        strategy=ctx.extra.get("scoring_strategy", "masked-marginals"),
        chunk=ctx.batch_size,
    )
    return _with_column(ctx, f"{config.name}_score", scores)


@register_scorer("esm3")
def score_esm3(ctx: ScoreContext) -> pd.DataFrame:
    """ESM3 masked marginals, structure-conditioned when a PDB is available
    (ref evoscale/compute_fitness.py:144-470). The structure track runs the
    real VQ-VAE tokenizer; ``--extra structure_checkpoint=`` points at a
    converted esm3 structure encoder, ``--checkpoint`` at the converted
    trunk. Without --structure-dir the scorer degrades to sequence-only
    (coords=None), matching the reference's use_structure=False branch."""
    import jax

    from proteingym_tpu.models import esm3
    from proteingym_tpu.pipeline.scorers import resolve_zoo_checkpoint

    presets = esm3.PRESETS | {"esm3_tiny": esm3.TINY}
    config, params = resolve_zoo_checkpoint(
        ctx.checkpoint, presets, "esm3_tiny", esm3.init_params,
        esm3.Esm3Config,
    )
    sc_spec = ctx.extra.get("structure_checkpoint")
    coords = None
    struct_params = None
    sc = esm3.STRUCTURE_ENCODER_PRESETS["esm3_structure_encoder_tiny"]
    if ctx.structure_dir is not None:
        try:
            coords = _load_structure(ctx)[:, :3]
        except FileNotFoundError:
            coords = None
    if coords is not None:
        if sc_spec:
            sc, struct_params = resolve_zoo_checkpoint(
                sc_spec, esm3.STRUCTURE_ENCODER_PRESETS,
                "esm3_structure_encoder",
                esm3.structure_encoder_init, esm3.StructureEncoderConfig,
            )
        elif (ctx.checkpoint and ctx.checkpoint not in presets
              and os.path.exists(str(ctx.checkpoint))):
            # preset names resolve to random init (resolver precedence:
            # preset wins over a same-named path), so only a real converted
            # directory triggers the degrade.
            # A real converted trunk with a RANDOM structure tokenizer would
            # feed noise codes into the structure track — worse than the
            # sequence-only path. Degrade to coords=None instead.
            import warnings

            warnings.warn(
                "esm3: --structure-dir given without --extra "
                "structure_checkpoint=; scoring sequence-only (random "
                "structure-VQ codes would degrade a converted trunk)"
            )
            coords = None
        else:
            # Smoke mode (random trunk): a random structure encoder is the
            # matching companion and keeps the structure path exercised.
            struct_params = esm3.structure_encoder_init(
                jax.random.PRNGKey(0), sc
            )
    scores = esm3.score_assay_esm3(
        params, config, struct_params, sc, ctx.record.target_seq,
        ctx.dms_frame["mutant"].tolist(), coords=coords,
        batch=ctx.batch_size,
    )
    return _with_column(ctx, "ESM3_score", scores)


@register_scorer("xtrimopglm")
def score_xtrimo(ctx: ScoreContext) -> pd.DataFrame:
    """xTrimoPGLM GLM scoring, MLM or AR branch
    (ref xtrimopglm/compute_fitness.py)."""
    from proteingym_tpu.models import xtrimo
    from proteingym_tpu.pipeline.scorers import resolve_zoo_checkpoint

    config, params = resolve_zoo_checkpoint(
        ctx.checkpoint, xtrimo.PRESETS, "xtrimopglm_1b", xtrimo.init_params,
        config_cls=xtrimo.XtrimoConfig,
    )
    scores = xtrimo.score_assay(
        params, config, ctx.record.target_seq,
        ctx.dms_frame["mutant"].tolist(),
        ctx.dms_frame["mutated_sequence"].tolist(),
        mode=ctx.extra.get("mode", "mlm"),
        chunk=ctx.batch_size,
        batch_size=ctx.batch_size,
    )
    return _with_column(ctx, "xtrimopglm_score", scores)


@register_scorer("saprot")
def score_saprot(ctx: ScoreContext) -> pd.DataFrame:
    """SaProt structure-aware masked scoring (ref saprot/compute_fitness.py).
    Published fair-esm-format checkpoints convert via ``pgym convert
    --family saprot``; pass their vocab.txt with ``--extra vocab_file=``
    and per-assay 3Di strings with ``--extra tridi_dir=`` (plain-letter
    FASTAs; the native quantizer is the fallback)."""
    from proteingym_tpu.models import esm2, saprot
    from proteingym_tpu.pipeline.scorers import resolve_zoo_checkpoint

    presets = {
        "saprot_35M": saprot.saprot_config("saprot_35M"),
        "saprot_650M": saprot.saprot_config("saprot_650M"),
    }
    config, params = resolve_zoo_checkpoint(
        ctx.checkpoint, presets, "saprot_35M", esm2.init_params,
        esm2.EsmConfig, prefer_sidecar_fields=True,
    )
    vocab = None
    vf = ctx.extra.get("vocab_file")
    if vf:
        vocab = saprot.SaProtFileVocab(vf)
        if vocab.size != config.alphabet_size:
            raise ValueError(
                f"vocab file has {vocab.size} tokens but checkpoint "
                f"alphabet_size is {config.alphabet_size}"
            )
    struc_seq = None
    tdir = ctx.extra.get("tridi_dir")
    if tdir:
        for stem in (ctx.record.DMS_id, ctx.record.UniProt_ID):
            f = Path(tdir) / f"{stem}.fasta"
            if f.exists():
                struc_seq = "".join(
                    l.strip() for l in open(f) if not l.startswith(">")
                ).lower()
                break
    coords = None if struc_seq is not None else _load_structure(ctx)
    scores = saprot.score_assay_saprot(
        params, config, ctx.record.target_seq, coords,
        ctx.dms_frame["mutant"].tolist(), struc_seq=struc_seq,
        batch_size=ctx.batch_size, vocab=vocab,
    )
    return _with_column(ctx, "SaProt_score", scores)


@register_scorer("esm_if1")
def score_esm_if1(ctx: ScoreContext) -> pd.DataFrame:
    """Inverse-folding ll_fullseq with the weight-compatible GVP-Transformer
    (ref esm/compute_fitness_esm_if1.py:33-39; published checkpoints load
    via ``pgym convert --family esm_if1``)."""
    from proteingym_tpu.models import gvp_transformer
    from proteingym_tpu.pipeline.scorers import resolve_zoo_checkpoint

    config, params = resolve_zoo_checkpoint(
        ctx.checkpoint, gvp_transformer.PRESETS, "esm_if1_tiny",
        gvp_transformer.init_params, gvp_transformer.GVPTransformerConfig,
    )
    chains_spec = ctx.extra.get("complex_chains")
    seqs = ctx.dms_frame["mutated_sequence"].tolist()
    if chains_spec:
        # --multichain-backbone: condition on every chain, decode the
        # target (ref esm/compute_fitness_esm_if1.py --multichain-backbone
        # + multichain_util.py)
        from proteingym_tpu.data.structures import parse_pdb_backbone

        target_chain = ctx.extra.get("target_chain", "A")
        pdb = None
        for stem in (ctx.record.UniProt_ID, ctx.record.DMS_id):
            cand = Path(ctx.structure_dir) / f"{stem}.pdb"
            if cand.exists():
                pdb = cand
                break
        if pdb is None:
            raise FileNotFoundError(f"No PDB for {ctx.record.DMS_id}")
        coords = {
            ch: parse_pdb_backbone(pdb, chain=ch)[0][:, :3]
            for ch in chains_spec.split(",")
        }
        scores = gvp_transformer.score_sequences_in_complex(
            params, config, coords, target_chain, seqs,
            batch_size=ctx.batch_size,
        )
    else:
        coords = _load_structure(ctx)[:, :3]  # N, CA, C
        scores = gvp_transformer.score_sequences(
            params, config, coords, seqs, batch_size=ctx.batch_size,
        )
    return _with_column(ctx, "esm_if1_score", scores)


@register_scorer("protssn")
def score_protssn(ctx: ScoreContext) -> pd.DataFrame:
    """ProtSSN: frozen PLM embeddings + EGNN readout, weight-compatible with
    the published protssn_k{k}_h{h}.pt checkpoints
    (ref protssn/compute_fitness.py:53-113; convert via
    ``pgym convert --family protssn``). ``--extra esm_checkpoint=`` selects
    the PLM; ``--extra norm_stats=`` points at the shipped
    cath_k{k}_mean_attr.pt statistics (identity statistics otherwise)."""
    import jax

    from proteingym_tpu.models import protssn
    from proteingym_tpu.pipeline.checkpoints import load_esm_checkpoint
    from proteingym_tpu.pipeline.scorers import resolve_zoo_checkpoint

    presets = protssn.PROTSSN_PRESETS | {
        "protssn_tiny": protssn.ProtssnEgnnConfig(
            name="protssn_tiny", input_dim=320, m_dim=32, n_layers=2,
        )
    }
    # the published ProtSSN_ensemble column averages the 9 k x h members:
    # --checkpoint and --extra norm_stats= accept comma-separated lists
    # (one entry each per member; a single norm_stats applies to all)
    specs = ([s.strip() for s in str(ctx.checkpoint).split(",")]
             if ctx.checkpoint else [None])
    if ctx.checkpoint and not all(specs):
        # an empty entry would resolve to a RANDOM-init preset and silently
        # pollute the ensemble average
        raise ValueError(
            f"empty entry in --checkpoint ensemble list: {ctx.checkpoint!r}"
        )
    stats_spec = ctx.extra.get("norm_stats")
    stats_paths = ([s.strip() for s in str(stats_spec).split(",")]
                   if stats_spec else [None])
    if len(stats_paths) == 1:
        stats_paths = stats_paths * len(specs)
    if len(stats_paths) != len(specs):
        raise ValueError(
            f"{len(specs)} checkpoints but {len(stats_paths)} norm_stats"
        )

    esm_params, esm_config = load_esm_checkpoint(
        ctx.extra.get("esm_checkpoint", "esm2_t6_8M")
    )
    coords = _load_structure(ctx)
    emb = np.asarray(
        protssn.esm_embeddings(esm_params, esm_config,
                               ctx.record.target_seq)
    )
    muts = ctx.dms_frame["mutant"].tolist()
    per_member = []
    for spec, stats_path in zip(specs, stats_paths):
        config, params = resolve_zoo_checkpoint(
            spec, presets, "protssn_tiny",
            protssn.init_egnn_params, protssn.ProtssnEgnnConfig,
            # converted sidecars carry dims inferred from the checkpoint
            # shapes; those must win over the (k, h) preset defaults
            prefer_sidecar_fields=True,
        )
        if esm_config.embed_dim != config.input_dim:
            if spec is None or spec in presets:
                # random-init preset: shrink/grow the EGNN to the PLM width
                config = dataclasses.replace(
                    config, input_dim=esm_config.embed_dim
                )
                params = protssn.init_egnn_params(
                    jax.random.PRNGKey(0), config
                )
            else:
                raise ValueError(
                    f"PLM width {esm_config.embed_dim} != EGNN input_dim "
                    f"{config.input_dim} of the converted checkpoint"
                )
        # graph depends on the member's k_neighbors
        src, dst, edge_attr, pos = protssn.build_calpha_graph(
            coords[:, :3], config.k_neighbors, config.cutoff,
            config.seq_dist_cut,
        )
        if stats_path:
            stats = protssn.load_norm_stats(stats_path)
        else:  # identity statistics: centering only (documented fallback)
            stats = {
                "pos_std": np.ones(3, np.float32),
                "edge_attr_mean": np.zeros(93, np.float32),
                "edge_attr_std": np.ones(93, np.float32) - 1e-10,
            }
        npos, nea = protssn.apply_norm_stats(pos, edge_attr, stats)
        logp = protssn.egnn_log_probs(
            params, config, emb, npos, src, dst, nea
        )
        per_member.append(
            protssn.score_mutants_egnn(logp, ctx.record.target_seq, muts)
        )
    scores = np.mean(per_member, axis=0)
    col = "ProtSSN_ensemble" if len(specs) > 1 else "ProtSSN_score"
    return _with_column(ctx, col, scores)


@register_scorer("mif_st")
@register_scorer("mif")
def score_mif(ctx: ScoreContext) -> pd.DataFrame:
    """MIF masked inverse folding (ref carp_mif/compute_fitness.py:31-48);
    ``mif_st`` is the sequence-transfer variant — a deeper/wider trunk
    (the ref MIF-ST couples MIF with the CARP-640M-pretrained stack) and
    its own score column."""
    import jax

    from proteingym_tpu.models.carp import CarpConfig
    from proteingym_tpu.models.structure_plms import (
        mif_init, mif_score_assay, mif_structure_features,
    )

    variant = ctx.extra.get("_scorer_name", "mif")
    coords = _load_structure(ctx)
    if variant == "mif_st":
        config = CarpConfig("mif_st", 16, 512, max_dilation=64)
    else:
        config = CarpConfig("mif", 8, 256, max_dilation=32)
    feat_dim = mif_structure_features(coords).shape[1]
    params = mif_init(jax.random.PRNGKey(0), config, feat_dim)
    scores = mif_score_assay(
        params, config, coords, ctx.record.target_seq,
        ctx.dms_frame["mutant"].tolist(),
    )
    column = "MIF_ST_score" if variant == "mif_st" else "MIF_score"
    return _with_column(ctx, column, scores)


@register_scorer("mulan")
def score_mulan(ctx: ScoreContext) -> pd.DataFrame:
    """MULAN: weight-compatible ESM2 trunk + structure-angle adapter
    (ref mulan/mulan/model.py; convert published checkpoints via
    ``pgym convert --family mulan``). phi/psi come from the backbone;
    chi1-5 stay at the reference's NaN fill unless precomputed angle
    tables are supplied via ``--extra angles_dir=`` (.npy (L, 7) radians).
    ``--extra method=additive`` keeps the legacy conditioning scorer."""
    import jax

    from proteingym_tpu.models import esm2
    from proteingym_tpu.models import mulan as mulan_mod
    from proteingym_tpu.pipeline.scorers import resolve_zoo_checkpoint

    if ctx.extra.get("method") == "additive":
        from proteingym_tpu.models.structure_plms import (
            mulan_init, mulan_score_assay,
        )

        coords = _load_structure(ctx)
        config = esm2.PRESETS.get(ctx.checkpoint or "esm2_t6_8M",
                                  esm2.PRESETS["esm2_t6_8M"])
        params = mulan_init(jax.random.PRNGKey(0), config)
        scores = mulan_score_assay(
            params, config, coords, ctx.record.target_seq,
            ctx.dms_frame["mutant"].tolist(), chunk=ctx.batch_size,
        )
        return _with_column(ctx, "MULAN_score", scores)

    import jax.numpy as jnp

    presets = {
        "mulan_small": mulan_mod.MulanConfig(
            name="mulan_small",
            esm=dataclasses.replace(esm2.PRESETS["esm2_t12_35M"],
                                    dtype=jnp.float32),
        ),
        "mulan_tiny": mulan_mod.MulanConfig(
            name="mulan_tiny",
            esm=dataclasses.replace(esm2.PRESETS["esm2_t6_8M"],
                                    dtype=jnp.float32),
        ),
    }
    config, params = resolve_zoo_checkpoint(
        ctx.checkpoint, presets, "mulan_tiny", mulan_mod.init_params,
    )
    angles = None
    adir = ctx.extra.get("angles_dir")
    if adir:
        for stem in (ctx.record.DMS_id, ctx.record.UniProt_ID):
            f = Path(adir) / f"{stem}.npy"
            if f.exists():
                angles = np.load(f)
                break
    if angles is None:
        coords = _load_structure(ctx)[:, :3]
        angles = mulan_mod.backbone_angle_features(coords)
    scores = mulan_mod.score_mutants(
        params, config, ctx.record.target_seq, angles,
        ctx.dms_frame["mutant"].tolist(), batch_size=ctx.batch_size,
    )
    return _with_column(ctx, "MULAN_score", scores)


@register_scorer("venusrem")
def score_venusrem(ctx: ScoreContext) -> pd.DataFrame:
    """VenusREM: ProSST-2048 logits blended with alignment count matrices
    (ref venusrem/compute_fitness.py; the published model IS
    AI4Protein/ProSST-2048 — convert it via ``pgym convert --family
    prosst``). Alignments: the assay MSA (a2m) for the residue blend;
    ``--extra struc_seq_aln_dir=`` for foldseek structure-alignment
    FASTAs; ``--extra alpha=`` (default 0.8). ``--extra method=esm``
    keeps the legacy ESM-based blend."""
    from proteingym_tpu.models import prosst as prosst_mod
    from proteingym_tpu.pipeline.scorers import resolve_zoo_checkpoint

    if ctx.extra.get("method") == "esm":
        from proteingym_tpu.models.structure_plms import (
            venusrem_score_assay,
        )
        from proteingym_tpu.pipeline.checkpoints import load_esm_checkpoint

        params, config = load_esm_checkpoint(
            ctx.extra.get("esm_checkpoint", "esm2_t6_8M")
        )
        seq_aln = None
        if ctx.msa_dir is not None and ctx.record.MSA_filename:
            msa = ctx.load_msa()
            seq_aln = msa.sequences()
        scores = venusrem_score_assay(
            params, config, ctx.record.target_seq,
            ctx.dms_frame["mutant"].tolist(),
            seq_alignment=seq_aln, chunk=ctx.batch_size,
        )
        return _with_column(ctx, "VenusREM_score", scores)

    config, params = resolve_zoo_checkpoint(
        ctx.checkpoint, prosst_mod.PROSST_PRESETS, "prosst_tiny",
        prosst_mod.prosst_init_params, prosst_mod.ProSSTConfig,
        prefer_sidecar_fields=True,
    )
    seq = ctx.record.target_seq
    k_states = config.ss_vocab_size - 3
    struct_tokens = None
    sdir = ctx.extra.get("structure_fasta_dir")
    if sdir:
        for stem in (ctx.record.DMS_id, ctx.record.UniProt_ID):
            f = Path(sdir) / f"{stem}.fasta"
            if f.exists():
                struct_tokens = prosst_mod.read_structure_sequence_fasta(f)
                break
    if struct_tokens is None:
        from proteingym_tpu.models.prosst import structure_token_ids

        coords = _load_structure(ctx)
        struct_tokens = structure_token_ids(coords, k_states)
    aa_aln = None
    aln_dir = ctx.extra.get("aa_seq_aln_dir")
    if aln_dir:
        # VenusREM-release alignment FASTAs (uniform-length, '>name/a-b'
        # headers in target coordinates)
        for stem in (ctx.record.DMS_id, ctx.record.UniProt_ID):
            f = Path(aln_dir) / f"{stem}.fasta"
            if f.exists():
                aa_aln = prosst_mod.read_alignment_fasta(f)
                break
    elif ctx.msa_dir is not None and ctx.record.MSA_filename:
        # assay a2m: use the PROCESSED focus-column rows (uniform length,
        # aligned to the target) — raw a2m rows are ragged/lowercase and
        # would corrupt the per-column counts
        msa = ctx.load_msa()
        fseqs = msa.sequences()
        if fseqs and len(fseqs[0]) == len(seq):
            aa_aln = ([f">msa/1-{len(seq)}"], fseqs)
    struct_aln = None
    saln_dir = ctx.extra.get("struc_seq_aln_dir")
    if saln_dir:
        for stem in (ctx.record.DMS_id, ctx.record.UniProt_ID):
            f = Path(saln_dir) / f"{stem}.fasta"
            if f.exists():
                struct_aln = prosst_mod.read_alignment_fasta(f)
                break
    scores = prosst_mod.venusrem_score_assay_real(
        params, config, seq, struct_tokens[: len(seq)],
        ctx.dms_frame["mutant"].tolist(),
        aa_alignment=aa_aln, struct_alignment=struct_aln,
        alpha=float(ctx.extra.get("alpha", 0.8)),
    )
    return _with_column(ctx, "VenusREM_score", scores)


@register_scorer("aido")
def score_aido(ctx: ScoreContext) -> pd.DataFrame:
    """AIDO-class MoE MLM with MSA retrieval (ref AIDO/compute_fitness.py)."""
    import jax

    from proteingym_tpu.models.structure_plms import (
        AidoConfig, aido_init, aido_score_assay,
    )

    config = AidoConfig()
    params = aido_init(jax.random.PRNGKey(0), config)
    msa_seqs = msa_w = None
    if ctx.msa_dir is not None and ctx.record.MSA_filename:
        msa = ctx.load_msa()
        msa_seqs, msa_w = msa.sequences(), msa.weights
    scores = aido_score_assay(
        params, config, ctx.record.target_seq,
        ctx.dms_frame["mutant"].tolist(),
        msa_sequences=msa_seqs, msa_weights=msa_w, chunk=ctx.batch_size,
    )
    return _with_column(ctx, "AIDO_score", scores)


@register_scorer("rsalor")
def score_rsalor(ctx: ScoreContext) -> pd.DataFrame:
    """RSALOR: RSA x MSA log-odds (ref RSALOR/run_rsalor.py)."""
    from proteingym_tpu.models import rsalor as rsalor_mod

    msa = ctx.load_msa()
    coords = None
    try:
        coords = _load_structure(ctx)
    except FileNotFoundError:
        pass
    model = rsalor_mod.fit_rsalor(msa.matrix, msa.weights, coords=coords)
    scores = _score_focus_model(
        ctx, msa,
        lambda wt, remapped: rsalor_mod.score_mutants(model, wt, remapped),
        ctx.dms_frame["mutant"].tolist(),
    )
    return _with_column(ctx, "RSALOR_score", scores)


def _plm_embeddings(ctx: ScoreContext, wt: str):
    """Per-residue trunk embeddings for VESPA-class heads.

    Default trunk: ESM2 (``--extra esm_checkpoint=``, VespaG's trunk).
    With ``--extra prot_t5_checkpoint=<dir from pgym convert --family
    prot_t5>`` the weight-compatible ProtT5 encoder supplies them instead
    — the trunk the reference's vespa CLI uses (ref
    vespa/compute_fitness.py; models/prot_t5.py). Returns (emb, dim)."""
    p5 = ctx.extra.get("prot_t5_checkpoint")
    if p5:
        from proteingym_tpu.models import prot_t5

        params, config = _load_prot_t5(p5)
        emb = np.asarray(prot_t5.embeddings(params, config, wt))
        return emb, config.d_model
    from proteingym_tpu.models.protssn import esm_embeddings
    from proteingym_tpu.pipeline.checkpoints import load_esm_checkpoint

    esm_params, esm_config = load_esm_checkpoint(
        ctx.extra.get("esm_checkpoint", "esm2_t6_8M")
    )
    emb = np.asarray(esm_embeddings(esm_params, esm_config, wt))
    return emb, esm_config.embed_dim


def _load_prot_t5(path):
    import dataclasses as _dc
    import json as _json

    from proteingym_tpu.models import prot_t5
    from proteingym_tpu.pipeline.checkpoints import restore_pytree

    params = restore_pytree(Path(path) / "params")
    meta = {}
    cfg_file = Path(path) / "config.json"
    if cfg_file.exists():
        meta = _json.loads(cfg_file.read_text())
    fields = {f.name for f in _dc.fields(prot_t5.ProtT5Config)}
    config = prot_t5.ProtT5Config(
        **{k: v for k, v in meta.items() if k in fields and k != "dtype"}
    )
    return params, config


@register_scorer("vespag")
@register_scorer("vespa")
def score_vespag(ctx: ScoreContext) -> pd.DataFrame:
    """VespaG: PLM-embedding head distilled from the native GEMME teacher
    (ref vespag/; the vespa CLI wrapper role is covered by the same
    conservation-x-logodds teacher over the trunk _plm_embeddings
    selects — ProtT5 when a converted checkpoint is supplied).

    With ``--extra vespa_mode=logodds`` and a decoder-bearing converted
    ProtT5 (pgym convert --family prot_t5 on a
    T5ForConditionalGeneration state dict), scores are the actual VESPA
    masked-reconstruction log-odds (Marquet et al. 2022): mask each
    position with <extra_id_0>, read the decoder's distribution, score =
    sum of logP(mt) - logP(wt) over mutated positions. (The published
    pipeline additionally blends a ProtT5-conservation CNN through a
    logistic head whose weights live in the uninstalled vespa package —
    log-odds is its dominant term.)"""
    import jax

    from proteingym_tpu.models import gemme as gemme_mod
    from proteingym_tpu.models import vespag as vespag_mod

    p5 = ctx.extra.get("prot_t5_checkpoint")
    mode = str(ctx.extra.get("vespa_mode", ""))
    if mode in ("full", "light"):
        # the published VESPA/VESPAl pipeline (Marquet et al. 2022):
        # ConsCNN conservation probabilities + BLOSUM62 (+ masked
        # log-odds in full mode) through a logistic SAV blend
        # (models/vespa_heads.py). Effect probabilities go through the
        # reference's own sum-log(1-p) ingestion (higher = fitter).
        from proteingym_tpu.models import prot_t5, vespa_heads
        from proteingym_tpu.pipeline.checkpoints import restore_pytree

        cc = ctx.extra.get("conscnn_checkpoint")
        if not (p5 and cc):
            raise ValueError(
                "vespa_mode=full/light needs --extra prot_t5_checkpoint="
                "<dir> and --extra conscnn_checkpoint=<dir from pgym "
                "convert --family vespa_conscnn>"
            )
        params, config = _load_prot_t5(p5)
        cnn = restore_pytree(Path(cc) / "params")
        wt = ctx.record.target_seq
        emb = np.asarray(prot_t5.embeddings(params, config, wt))
        cons = np.asarray(vespa_heads.conservation_probs(cnn, emb))
        logodds = None
        if mode == "full":
            tab = np.asarray(prot_t5.masked_logodds(params, config, wt))
            cols = [prot_t5.AA_TOKEN_IDS[a] for a in vespa_heads.AA20]
            logodds = tab[:, cols]
        blend = None
        bpath = ctx.extra.get("vespa_blend")
        if bpath:
            import json as _json

            raw = _json.loads(Path(bpath).read_text())
            blend = {"w": np.asarray(raw["w"], np.float32),
                     "b": float(raw["b"])}
        table = vespa_heads.vespa_table(wt, cons, logodds, blend)
        # score_mutants applies the reference's sum-log(1-p) ingestion
        # (higher = fitter) — no negation here
        scores = vespa_heads.score_mutants(
            table, wt, ctx.dms_frame["mutant"].tolist()
        )
        return _with_column(ctx, "VESPA_score", scores)
    if mode == "logodds":
        if not p5:
            raise ValueError(
                "vespa_mode=logodds needs --extra prot_t5_checkpoint="
                "<dir from pgym convert --family prot_t5 on a "
                "T5ForConditionalGeneration state dict>"
            )
        from proteingym_tpu.data.mutants import is_wt_row
        from proteingym_tpu.models import prot_t5

        params, config = _load_prot_t5(p5)
        wt = ctx.record.target_seq
        table = prot_t5.masked_logodds(params, config, wt)
        ids = prot_t5.AA_TOKEN_IDS
        scores = np.zeros(len(ctx.dms_frame))
        for i, m in enumerate(ctx.dms_frame["mutant"].tolist()):
            if is_wt_row(m):
                continue
            for tok in str(m).split(":"):
                w, pos, mt = tok[0], int(tok[1:-1]) - 1, tok[-1]
                if wt[pos] != w:
                    raise ValueError(f"WT mismatch in {tok}")
                scores[i] += table[pos, ids[mt]] - table[pos, ids[w]]
        return _with_column(ctx, "VESPA_score", scores)

    # converted-checkpoint path: the real VespaG head (pgym convert
    # --family vespag on the published state_dict_v2.pt) over PLM
    # embeddings, scored with the reference predict semantics
    # (masked landscape + summed y[pos][to] + sigmoid)
    ckpt = ctx.checkpoint
    if ckpt and (Path(ckpt) / "params").exists():
        import json as _json

        from proteingym_tpu.pipeline.checkpoints import restore_pytree

        params = restore_pytree(Path(ckpt) / "params")
        meta = {}
        cfg_file = Path(ckpt) / "config.json"
        if cfg_file.exists():
            meta = _json.loads(cfg_file.read_text())
        params["arch"] = meta.get("arch", "fnn")
        wt = ctx.record.target_seq
        emb, _ = _plm_embeddings(ctx, wt)
        table = np.asarray(vespag_mod.apply(params, emb))
        scores = vespag_mod.score_mutants_reference(
            table, wt, ctx.dms_frame["mutant"].tolist(),
            normalize=str(ctx.extra.get("normalize", "1")) not in
            ("0", "false", "False"),
        )
        return _with_column(ctx, "VespaG_score", scores)

    msa = ctx.load_msa()
    teacher = gemme_mod.fit_gemme(msa.matrix, msa.weights)
    wt = msa.focus_seq_trimmed.upper()
    emb, embed_dim = _plm_embeddings(ctx, wt)
    config = vespag_mod.VespagConfig(embed_dim=embed_dim)
    params = vespag_mod.init_params(jax.random.PRNGKey(0), config)
    params = vespag_mod.train_from_teacher(
        params, emb, teacher.combined(),
        steps=int(ctx.extra.get("train_steps", 200)),
    )
    scores = _score_focus_model(
        ctx, msa,
        lambda wt_seq, remapped: vespag_mod.score_mutants(
            params, emb, wt_seq, remapped
        ),
        ctx.dms_frame["mutant"].tolist(),
    )
    return _with_column(ctx, "VespaG_score", scores)


@register_scorer("ohe_ridge")
@register_scorer("embeddings_ridge")
@register_scorer("proteinnpt")
def score_supervised(ctx: ScoreContext) -> pd.DataFrame:
    """Supervised baselines: per-CV-scheme out-of-fold predictions for the
    full ProteinNPT-repo model list (SURVEY.md §2.2 supervised note):

      - ``ohe_ridge``        OHE - Not augmented / OHE - Augmented - <X>
      - ``embeddings_ridge`` Embeddings - Augmented - <X> (subs AND the
                             three Embeddings_*_indels models — mean-pooled
                             trunk embeddings are length-free)
      - ``proteinnpt``       the axial-attention non-parametric transformer

    The 'Augmented' variants take the zero-shot column via ``--extra
    aug_col=<column in the assay frame>`` or ``--extra aug_file=<scores
    csv>`` (+ optional ``aug_file_col=``; default: last non-key column),
    joined on mutant. ``embeddings_ridge`` embeds mutated sequences with
    the ESM2 trunk from ``--checkpoint`` (any converted ESM works)."""
    from proteingym_tpu.models.supervised_baselines import (
        load_aug_scores, make_embedding_feature_fn, run_supervised_baseline,
    )

    name = ctx.extra.get("_scorer_name", "ohe_ridge")
    aux = None
    aug_col = ctx.extra.get("aug_col")
    aug_file = ctx.extra.get("aug_file")
    if aug_col:
        aux = ctx.dms_frame[aug_col].to_numpy(np.float64)
    elif aug_file:
        aux = load_aug_scores(
            ctx.dms_frame, aug_file, ctx.extra.get("aug_file_col")
        )

    feature_fn = None
    model = "OHE_ridge"
    if name == "embeddings_ridge":
        model = "embeddings_ridge"
        feature_fn = make_embedding_feature_fn(
            ctx.checkpoint, batch_size=ctx.batch_size
        )
    npt_config = None
    if name == "proteinnpt":
        model = "ProteinNPT"
        if any(k in ctx.extra for k in ("npt_steps", "npt_layers",
                                        "npt_dim")):
            from proteingym_tpu.models.protein_npt import ProteinNptConfig

            defaults = ProteinNptConfig()
            npt_config = ProteinNptConfig(
                steps=int(ctx.extra.get("npt_steps", defaults.steps)),
                num_layers=int(
                    ctx.extra.get("npt_layers", defaults.num_layers)
                ),
                embed_dim=int(ctx.extra.get("npt_dim", defaults.embed_dim)),
            )

    results = run_supervised_baseline(
        ctx.dms_frame, ctx.record.target_seq, model=model,
        lam=float(ctx.extra.get("lam", 1.0)),
        feature_fn=feature_fn, aux=aux, npt_config=npt_config,
    )
    prefix = {"ohe_ridge": "OHE_ridge", "embeddings_ridge": "Emb_ridge",
              "proteinnpt": "ProteinNPT"}[name]
    if aux is not None and name != "proteinnpt":
        prefix += "_aug"
    # flatten: one column per scheme appended to the assay frame
    out = ctx.dms_frame.copy()
    for scheme, frame in results.items():
        out[f"{prefix}_{scheme}"] = frame["y_pred"].to_numpy()
    return out


@register_scorer("kermut")
def score_kermut(ctx: ScoreContext) -> pd.DataFrame:
    """Kermut GP out-of-fold predictions (ref kermut/proteingym_benchmark.py).
    Requires a structure for the distance/conditional-prob kernel terms."""
    import jax

    from proteingym_tpu.models import kermut as kermut_mod
    from proteingym_tpu.models import protein_mpnn as mpnn
    from proteingym_tpu.models.supervised_baselines import assign_folds

    coords = _load_structure(ctx)
    mpnn_config = mpnn.MpnnConfig(
        name="kermut_probs", hidden_dim=64, edge_features=64, k_neighbors=16
    )
    mpnn_params = mpnn.init_params(jax.random.PRNGKey(0), mpnn_config)
    probs = kermut_mod.conditional_probs_from_mpnn(
        mpnn_params, mpnn_config, coords, ctx.record.target_seq,
        n_orders=int(ctx.extra.get("n_orders", 2)),
    )
    data = kermut_mod.KermutData.build(probs, coords[:, 1])
    mutants = ctx.dms_frame["mutant"].tolist()
    enc = kermut_mod.encode_variants(mutants)
    y = ctx.dms_frame["DMS_score"].to_numpy(np.float64)
    out = ctx.dms_frame.copy()
    for scheme in ("fold_random_5", "fold_modulo_5", "fold_contiguous_5"):
        folds = (
            ctx.dms_frame[scheme].to_numpy()
            if scheme in ctx.dms_frame
            else assign_folds(mutants, scheme)
        )
        preds = np.zeros(len(y))
        for fold in np.unique(folds):
            test = folds == fold
            train = tuple(t[~test] for t in enc)
            test_enc = tuple(t[test] for t in enc)
            hypers = kermut_mod.fit(
                data, train, y[~test],
                steps=int(ctx.extra.get("gp_steps", 50)),
            )
            preds[test] = kermut_mod.predict(
                hypers, data, train, y[~test], test_enc
            )
        out[f"kermut_{scheme}"] = preds
    return out


@register_scorer("s2f")
@register_scorer("s3f")
@register_scorer("s3f_msa")
def score_s3f(ctx: ScoreContext) -> pd.DataFrame:
    """S2F/S3F/S3F-MSA: frozen ESM2 features through the weight-compatible
    GVP-GNN (ref S3F/s3f/gvp.py, task.py, script/evaluate.py; convert
    published checkpoints via ``pgym convert --family s3f``). The surface
    stream consumes precomputed point clouds from
    ``--extra surface_dir=`` (.npz with position/feature arrays); without
    one the s3f variants run structure-only like s2f. S3F-MSA blends the
    alignment count prior on top (its published recipe)."""
    import jax
    import jax.numpy as jnp

    from proteingym_tpu.models import esm2, s3f
    from proteingym_tpu.pipeline.checkpoints import load_esm_checkpoint
    from proteingym_tpu.pipeline.scorers import resolve_zoo_checkpoint

    variant = ctx.extra.get("_scorer_name", "s3f")
    use_surface = variant != "s2f"
    presets = s3f.S3F_PRESETS
    default = "s3f_tiny" if use_surface else "s2f_tiny"
    config, params = resolve_zoo_checkpoint(
        ctx.checkpoint, presets, default, s3f.gvpgnn_init,
        s3f.GvpGnnConfig, prefer_sidecar_fields=True,
    )
    coords = _load_structure(ctx)
    esm_params, esm_config = load_esm_checkpoint(
        ctx.extra.get("esm_checkpoint", "esm2_t6_8M")
    )
    if esm_config.embed_dim != config.node_in:
        if ctx.checkpoint is None or ctx.checkpoint in presets:
            config = dataclasses.replace(config,
                                         node_in=esm_config.embed_dim)
            params = s3f.gvpgnn_init(jax.random.PRNGKey(0), config)
        else:
            raise ValueError(
                f"PLM width {esm_config.embed_dim} != checkpoint node_in "
                f"{config.node_in}"
            )
    seq = ctx.record.target_seq
    tokens = jnp.asarray(esm2.ALPHABET.tokenize(seq)[None])
    logits, reps = esm2.apply(esm_params, esm_config, tokens,
                              return_representations=True)
    emb = np.asarray(reps[max(reps)])[0, 1 : 1 + len(seq)]
    # MyESM logit remap into the torchdrug residue order (model.py:64-65)
    cols = [esm2.ALPHABET.get_idx(a) for a in s3f.TD_RESIDUES]
    esm20 = np.asarray(logits)[0, 1 : 1 + len(seq)][:, cols]

    pos = coords[:, 1].astype(np.float32)  # CA
    src, dst = s3f.radius_graph(pos, config.radius)
    surface = None
    if use_surface:
        sdir = ctx.extra.get("surface_dir")
        if sdir:
            for stem in (ctx.record.UniProt_ID, ctx.record.DMS_id):
                f = Path(sdir) / f"{stem}.npz"
                if f.exists():
                    blob = np.load(f)
                    surface = s3f.build_surface_inputs(
                        blob["position"], blob["feature"], pos, config
                    )
                    break
    node_logits = s3f.gvpgnn_node_logits(
        params, config, emb, pos, src, dst, surface=surface
    )
    plddt = None
    try:
        from proteingym_tpu.data.structures import parse_pdb_bfactors

        for stem in (ctx.record.UniProt_ID, ctx.record.DMS_id):
            pdb = Path(ctx.structure_dir) / f"{stem}.pdb"
            if pdb.exists():
                plddt = parse_pdb_bfactors(pdb)
                break
    except Exception:
        plddt = None
    if plddt is not None and len(plddt) != len(seq):
        plddt = None
    scores = s3f.score_mutants_gvpgnn(
        node_logits, esm20, plddt, seq, ctx.dms_frame["mutant"].tolist()
    )
    if variant == "s3f_msa":
        from proteingym_tpu.models.structure_plms import (
            alignment_count_logits,
        )

        msa = ctx.load_msa()
        msa_seqs = msa.sequences()
        if msa_seqs and len(msa_seqs[0]) == len(seq):
            prior = np.asarray(alignment_count_logits(msa_seqs))
            aa_idx = {a: i for i, a in enumerate("ACDEFGHIKLMNPQRSTVWY")}
            extra = np.zeros(len(scores))
            for i, m in enumerate(ctx.dms_frame["mutant"].tolist()):
                if is_wt_row(m):
                    continue
                for tok in m.split(":"):
                    wt, p, mt = tok[0], int(tok[1:-1]) - 1, tok[-1]
                    extra[i] += prior[p, aa_idx[mt]] - prior[p, aa_idx[wt]]
            scores = scores + extra
    column = {"s2f": "S2F_score", "s3f": "S3F_score",
              "s3f_msa": "S3F_MSA_score"}[variant]
    return _with_column(ctx, column, scores)


@register_scorer("prosst")
def score_prosst(ctx: ScoreContext) -> pd.DataFrame:
    """ProSST: DeBERTa-style sequence-structure disentangled attention
    (ref prosst/compute_fitness.py:15-120; convert HF checkpoints via
    ``pgym convert --family prosst``). Structure tokens come from
    ``--extra structure_fasta_dir=`` (ProSST's comma-separated-int FASTAs)
    or, failing that, the native 3Di-style quantizer over the PDB backbone.
    ``--extra method=additive`` keeps the legacy additive-conditioning
    scorer."""
    import jax

    from proteingym_tpu.models import prosst as prosst_mod
    from proteingym_tpu.pipeline.scorers import resolve_zoo_checkpoint

    if ctx.extra.get("method") == "additive":
        from proteingym_tpu.models import esm2
        from proteingym_tpu.models.prosst import (
            prosst_init, score_assay_prosst,
        )

        coords = _load_structure(ctx)
        config = esm2.PRESETS.get(
            ctx.extra.get("esm_checkpoint", "esm2_t6_8M"),
            esm2.PRESETS["esm2_t6_8M"],
        )
        k = int(ctx.extra.get("k_structure", 2048))
        params = prosst_init(jax.random.PRNGKey(0), config, k_structure=k)
        scores = score_assay_prosst(
            params, config, coords, ctx.record.target_seq,
            ctx.dms_frame["mutant"].tolist(), k_structure=k,
            chunk=ctx.batch_size,
        )
        return _with_column(ctx, f"ProSST_{k}_score", scores)

    config, params = resolve_zoo_checkpoint(
        ctx.checkpoint, prosst_mod.PROSST_PRESETS, "prosst_tiny",
        prosst_mod.prosst_init_params, prosst_mod.ProSSTConfig,
        prefer_sidecar_fields=True,
    )
    seq = ctx.record.target_seq
    k_states = config.ss_vocab_size - 3
    struct_tokens = None
    sdir = ctx.extra.get("structure_fasta_dir")
    if sdir:
        for stem in (ctx.record.DMS_id, ctx.record.UniProt_ID):
            f = Path(sdir) / f"{stem}.fasta"
            if f.exists():
                struct_tokens = prosst_mod.read_structure_sequence_fasta(f)
                break
    if struct_tokens is None and ctx.extra.get("quantizer_dir"):
        # the real ProSST pipeline: GVP AutoGraphEncoder (pgym convert
        # --family prosst_quantizer on the published AE.pt) + k-means
        # centroids (sklearn joblib or .npy) over the PDB backbone
        from proteingym_tpu.models import prosst_quantizer as pq
        from proteingym_tpu.pipeline.checkpoints import restore_pytree

        qdir = Path(str(ctx.extra["quantizer_dir"]))
        qparams = restore_pytree(qdir / "params")
        qcfg = pq.AutoGraphEncoderConfig()
        qcfg_file = qdir / "config.json"
        if qcfg_file.exists():
            import dataclasses as _dc
            import json as _json

            meta = _json.loads(qcfg_file.read_text())
            fields = {f.name for f in _dc.fields(pq.AutoGraphEncoderConfig)}
            kw = {k: (tuple(v) if isinstance(v, list) else v)
                  for k, v in meta.items() if k in fields}
            if kw:
                qcfg = pq.AutoGraphEncoderConfig(**kw)
        cents = ctx.extra.get("quantizer_centroids")
        if cents is None:
            for cand in (qdir / f"{k_states}.npy", qdir / "centroids.npy"):
                if cand.exists():
                    cents = cand
                    break
        if cents is None:
            raise FileNotFoundError(
                "prosst quantizer_dir given but no centroids found; pass "
                "--extra quantizer_centroids=<K.npy|K.joblib>"
            )
        cents = str(cents)
        if cents.endswith(".joblib"):
            import joblib

            km = joblib.load(cents)
            centroids = np.asarray(km.cluster_centers_, np.float32)
        else:
            centroids = np.load(cents)
        coords = _load_structure(ctx)
        struct_tokens = pq.structure_tokens_from_coords(
            coords, qparams, qcfg, centroids
        )
    if struct_tokens is None:
        from proteingym_tpu.models.prosst import structure_token_ids

        coords = _load_structure(ctx)
        struct_tokens = structure_token_ids(coords, k_states)
    scores = prosst_mod.score_assay_prosst_real(
        params, config, seq, struct_tokens[: len(seq)],
        ctx.dms_frame["mutant"].tolist(),
    )
    return _with_column(ctx, f"{config.name}_score", scores)


@register_scorer("provean")
def score_provean(ctx: ScoreContext) -> pd.DataFrame:
    """PROVEAN delta alignment scores (the external tool's column in the
    DMS/indels + clinical lists; models/provean.py banner documents the
    BLAST/CD-HIT -> MSA-clustering adaptation). Indel-capable."""
    from proteingym_tpu.models import provean

    msa = ctx.load_msa()
    wt = ctx.record.target_seq
    clusters = provean.cluster_supporting_set(
        wt, msa.sequences(),
        max_clusters=int(ctx.extra.get("max_clusters", 30)),
        max_candidates=int(ctx.extra.get("max_candidates", 200)),
    )
    seqs = ctx.dms_frame.get(
        "mutated_sequence", ctx.dms_frame["mutant"]
    ).tolist()
    scores = provean.provean_scores(
        wt, seqs, clusters,
        max_per_cluster=int(ctx.extra.get("max_per_cluster", 5)),
    )
    return _with_column(ctx, "Provean_score", scores)


@register_scorer("wavenet")
def score_wavenet(ctx: ScoreContext) -> pd.DataFrame:
    """Wavenet / SeqDesign causal-CNN AR model, trained on the assay MSA
    then scoring variants by AR log-likelihood (indel-capable;
    models/wavenet.py)."""
    import jax

    from proteingym_tpu.models import wavenet

    msa = ctx.load_msa()
    c = wavenet.WavenetConfig(
        steps=int(ctx.extra.get("steps", 400)),
        num_layers=int(ctx.extra.get("num_layers", 12)),
    )
    params = wavenet.init_params(jax.random.PRNGKey(0), c)
    params, _ = wavenet.train(
        params, c, msa.sequences(), weights=msa.weights,
        seed=int(ctx.extra.get("seed", 0)),
    )
    seqs = ctx.dms_frame.get(
        "mutated_sequence", ctx.dms_frame["mutant"]
    ).tolist()
    scores = wavenet.score_sequences(params, c, seqs,
                                     batch=ctx.batch_size)
    return _with_column(ctx, "Wavenet_score", scores)
