"""Scorer plugin registry: one callable contract for every model family.

The reference's L2 contract is "read one assay CSV, write <DMS_id>.csv with
a model-score column" (SURVEY.md §1, L2). Here each scorer is a function

    scorer(ctx: ScoreContext) -> pd.DataFrame   # with a score column

registered by name; the CLI (pipeline/cli.py) resolves names to scorers and
handles reference-row lookup, IO, manifests, and telemetry. New model
families plug in with @register_scorer and become CLI-visible for free.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Callable, Dict, Optional

import numpy as np

from proteingym_tpu.data.mutants import is_wt_row
import pandas as pd

log = logging.getLogger(__name__)

SCORERS: Dict[str, Callable] = {}


def register_scorer(name: str):
    def deco(fn):
        SCORERS[name] = fn
        return fn
    return deco


@dataclasses.dataclass
class ScoreContext:
    """Everything a scorer may need for one (model, assay) task."""

    record: "AssayRecord"  # reference row
    dms_frame: pd.DataFrame  # cleaned assay frame (mutant, mutated_sequence, ...)
    msa_dir: Optional[Path] = None
    weights_dir: Optional[Path] = None
    checkpoint: Optional[str] = None  # model checkpoint path or preset name
    structure_dir: Optional[Path] = None
    indel_mode: bool = False
    batch_size: int = 32
    extra: dict = dataclasses.field(default_factory=dict)

    # -- shared lazy resources ------------------------------------------------
    _msa = None
    _weights = None

    def load_msa(self, theta: Optional[float] = None):
        """Load + preprocess the assay's MSA, computing/caching weights."""
        if self._msa is not None:
            return self._msa
        from proteingym_tpu.msa.parser import load_msa
        from proteingym_tpu.msa.weights import sequence_weights

        if self.msa_dir is None or self.record.MSA_filename is None:
            raise FileNotFoundError(
                f"No MSA available for {self.record.DMS_id}"
            )
        msa = load_msa(Path(self.msa_dir) / self.record.MSA_filename)
        theta = theta if theta is not None else (self.record.MSA_theta or 0.2)

        weights = None
        if self.weights_dir is not None and self.record.weight_file_name:
            wpath = Path(self.weights_dir) / self.record.weight_file_name
            if wpath.exists():
                weights = np.load(wpath)
        if weights is None or len(weights) != msa.num_sequences:
            weights = sequence_weights(msa.matrix, theta=theta)
            if self.weights_dir is not None and self.record.weight_file_name:
                Path(self.weights_dir).mkdir(parents=True, exist_ok=True)
                np.save(Path(self.weights_dir) / self.record.weight_file_name,
                        weights)
        self._msa = dataclasses.replace(msa, weights=weights)
        return self._msa

    @property
    def msa_start0(self) -> int:
        """0-indexed MSA start in full-sequence coordinates."""
        return (self.record.MSA_start or 1) - 1


def resolve_zoo_checkpoint(spec, presets: dict, default_preset: str,
                           init_fn, config_cls=None,
                           prefer_sidecar_fields: bool = False):
    """Resolve a --checkpoint spec for a preset-based model family.

    None -> default preset, RANDOM init (documented smoke/test behavior);
    preset name -> that preset, random init; an existing 'pgym convert'
    output directory (params/ + config.json) -> restored weights; anything
    else raises instead of silently scoring with random weights.
    Returns (config, params)."""
    import jax

    if not spec:
        config = presets[default_preset]
        return config, init_fn(jax.random.PRNGKey(0), config)
    if spec in presets:
        config = presets[spec]
        return config, init_fn(jax.random.PRNGKey(0), config)
    p = Path(spec)
    if (p / "params").exists():
        from proteingym_tpu.pipeline.checkpoints import restore_pytree

        config = presets[default_preset]
        cfg_file = p / "config.json"
        if cfg_file.exists():
            import dataclasses as _dc
            import json as _json

            meta = _json.loads(cfg_file.read_text())
            preset = meta.get("preset")
            if preset in presets and not prefer_sidecar_fields:
                config = presets[preset]
            elif config_cls is not None:
                fields = {f.name for f in _dc.fields(config_cls)}
                kw = {k: (tuple(v) if isinstance(v, list) else v)
                      for k, v in meta.items() if k in fields}
                if kw:
                    config = config_cls(**kw)
        return config, restore_pytree(p / "params")
    raise ValueError(
        f"Unknown checkpoint {spec!r}: not a preset "
        f"({sorted(presets)}) and not a converted checkpoint directory"
    )


# ---------------------------------------------------------------------------
# Alignment-based scorers (runnable from MSAs alone)
# ---------------------------------------------------------------------------

@register_scorer("site_independent")
def score_site_independent(ctx: ScoreContext) -> pd.DataFrame:
    """Weighted single-site frequency model (ref EVmutation/score_mutants.py:14
    via to_independent_model; trained natively here)."""
    from proteingym_tpu.models.potts import train_site_independent

    msa = ctx.load_msa()
    model = _trained_site_independent(msa, ctx)
    return _score_potts(model, ctx, "Site_Independent_score")


@register_scorer("potts")
@register_scorer("evmutation")
def score_potts(ctx: ScoreContext) -> pd.DataFrame:
    """Potts model: load a plmc .model checkpoint when given, else train by
    pseudolikelihood from the MSA (SURVEY.md §2.3 plmc replacement)."""
    from proteingym_tpu.models.potts import read_plmc_model, train_potts_plm

    if ctx.checkpoint:
        model = read_plmc_model(ctx.checkpoint)
    else:
        msa = ctx.load_msa()
        model = train_potts_plm(
            msa.matrix,
            msa.weights,
            "-ACDEFGHIKLMNPQRSTVWY",
            _index_list(msa, ctx),
            msa.focus_seq_trimmed,
            steps=int(ctx.extra.get("plm_steps", 300)),
        )
    return _score_potts(model, ctx, "EVmutation_score")


def _index_list(msa, ctx: ScoreContext) -> np.ndarray:
    start = msa.focus_start if msa.focus_start is not None else (
        ctx.record.MSA_start or 1
    )
    return np.asarray(msa.focus_cols) + start


def _trained_site_independent(msa, ctx: ScoreContext):
    from proteingym_tpu.models.potts import train_site_independent

    return train_site_independent(
        msa.matrix,
        msa.weights,
        "-ACDEFGHIKLMNPQRSTVWY",
        _index_list(msa, ctx),
        msa.focus_seq_trimmed,
    )


def _score_potts(model, ctx: ScoreContext, column: str) -> pd.DataFrame:
    out = ctx.dms_frame.copy()
    out[column] = np.asarray(model.delta_hamiltonians(out["mutant"].tolist()))
    return out


@register_scorer("hmm")
def score_hmm(ctx: ScoreContext) -> pd.DataFrame:
    """Profile-HMM forward log-odds vs WT (ref HMM/score_hmm.py:9-111;
    native forward algorithm, no HMMER binaries)."""
    from proteingym_tpu.models.hmm import build_profile_hmm, score_sequences

    msa = ctx.load_msa()
    hmm = build_profile_hmm(msa.matrix, msa.weights)
    seqs = ctx.dms_frame["mutated_sequence"].tolist()
    wt = ctx.record.target_seq
    if not ctx.indel_mode:
        # substitution assays score the MSA-covered slice
        s0, s1 = ctx.msa_start0, ctx.record.MSA_end or len(wt)
        seqs = [s[s0:s1] for s in seqs]
        wt = wt[s0:s1]
    lls = score_sequences(hmm, seqs + [wt])
    out = ctx.dms_frame.copy()
    out["HMM_score"] = lls[:-1] - lls[-1]
    return out


@register_scorer("escott")
@register_scorer("gemme")
def score_gemme(ctx: ScoreContext) -> pd.DataFrame:
    """Native GEMME-class evolutionary-distance predictor
    (ref gemme/compute_fitness.py wraps the external package). As
    ``escott``, the conservation signal is modulated by per-position
    relative solvent accessibility when a structure is available (the
    ESCOTT/PRESCOTT refinement, ref escott/compute_fitness.py)."""
    from proteingym_tpu.data.mutants import set_mutant_offset
    from proteingym_tpu.models import gemme as gemme_mod

    msa = ctx.load_msa()
    model = gemme_mod.fit_gemme(msa.matrix, msa.weights)
    muts = ctx.dms_frame["mutant"].tolist()
    name = ctx.extra.get("_scorer_name", "gemme")
    if name == "escott":
        # ESCOTT ingests a full (L, 20) delta landscape and sums RAW
        # entries per sub-mutant (ref escott/compute_fitness.py:92-101,
        # parity-tested in tests/test_reference_recipe_parity.py); build
        # the delta surface (WT cells 0, like evolCombi) and route
        # through the exact reference extraction
        mode = ctx.extra.get("mode", "combined")

        def escott_fn(wt, remapped):
            table = {
                "combined": model.combined(),
                "epistatic": model.pred_epi,
                "independent": model.pred_ind,
            }[mode]
            aa_cols = [model.alphabet.index(a)
                       for a in gemme_mod.ESCOTT_AA_VOCAB]
            wt_rows = np.asarray([model.alphabet.index(a) for a in wt])
            land = (table[:, aa_cols]
                    - table[np.arange(len(wt)), wt_rows][:, None])
            return np.asarray(gemme_mod.escott_extract_scores(
                land, remapped, offset=1))

        scores = _score_focus_model(ctx, msa, escott_fn, muts)
    else:
        scores = _score_focus_model(
            ctx, msa, lambda wt, remapped: gemme_mod.score_mutants(
                model, wt, remapped, mode=ctx.extra.get("mode", "combined")
            ), muts,
        )
    if name == "escott" and ctx.structure_dir is not None:
        from proteingym_tpu.data.structures import parse_pdb_backbone
        from proteingym_tpu.models.rsalor import rsa_from_structure

        for stem in (ctx.record.UniProt_ID, ctx.record.DMS_id):
            pdb = Path(ctx.structure_dir) / f"{stem}.pdb"
            if pdb.exists() and muts:
                coords, _ = parse_pdb_backbone(pdb)
                if coords.shape[0] != len(ctx.record.target_seq):
                    # the parser drops incomplete residues and carries no
                    # residue numbering — a length mismatch means DMS
                    # positions cannot be trusted to index the RSA array,
                    # so fall back to unmodulated GEMME scores
                    print(
                        f"escott/{ctx.record.DMS_id}: structure length "
                        f"{coords.shape[0]} != target {len(ctx.record.target_seq)}; "
                        "skipping RSA modulation"
                    )
                    break
                rsa = np.asarray(rsa_from_structure(coords))
                # buried positions (low RSA) amplify the epistatic signal;
                # multi-mutants take the mean weight over their positions
                weight = 1.0 + (1.0 - rsa)

                def mut_weight(m):
                    pos = np.clip(
                        [int(t[1:-1]) - 1 for t in m.split(":")],
                        0, len(weight) - 1,
                    )
                    return float(weight[pos].mean())

                scores = np.asarray(scores) * np.array(
                    [mut_weight(m) for m in muts]
                )
                break
    out = ctx.dms_frame.copy()
    col = "ESCOTT_score" if name == "escott" else "GEMME_score"
    out[col] = scores
    return out


@register_scorer("siterm")
def score_siterm(ctx: ScoreContext) -> pd.DataFrame:
    """SiteRM: one reversible 21-state rate matrix per site learned from
    cherry transitions with prior pseudocounts, scored by expm transition
    likelihoods (ref SiteRM/compute_fitness.py; native cherries + JAX GTR
    fit instead of cherryml/FastCherries). ``--extra prior_matrix=`` points
    at a cherryml-format rate matrix (the reference ships lg_with_gaps.txt);
    ``--extra method=f81`` selects the fast closed-form F81 variant."""
    from proteingym_tpu.models import siterm as siterm_mod

    msa = ctx.load_msa()
    muts = ctx.dms_frame["mutant"].tolist()
    if ctx.extra.get("method") == "f81":
        model = siterm_mod.fit_siterm(
            msa.matrix, msa.weights,
            max_pairs=ctx.extra.get("max_pairs"),
        )
        score_fn = lambda wt, remapped: siterm_mod.score_mutants(
            model, wt, remapped
        )
    else:
        prior_path = ctx.extra.get("prior_matrix")
        prior_Q = None
        if prior_path:
            prior_Q, states = siterm_mod.read_rate_matrix(prior_path)
            # Shipped matrices (e.g. lg_with_gaps.txt) are in PAML state
            # order, not ALPHABET21 order — permute or the LG rates land
            # on the wrong amino-acid pairs.
            prior_Q = siterm_mod.reorder_rate_matrix(prior_Q, states)
        mp = ctx.extra.get("max_pairs")
        gtr = siterm_mod.fit_site_rate_matrices(
            msa.matrix, msa.weights, prior_Q=prior_Q,
            epochs=int(ctx.extra.get("epochs", 100)),
            max_pairs=int(mp) if mp else None,
        )
        score_fn = lambda wt, remapped: siterm_mod.score_mutants_gtr(
            gtr, wt, remapped
        )
    scores = _score_focus_model(ctx, msa, score_fn, muts)
    out = ctx.dms_frame.copy()
    out["SiteRM_score"] = scores
    return out


def _score_focus_model(ctx: ScoreContext, msa, score_fn, mutants,
                       require_alphabet: str | None = None) -> np.ndarray:
    """Remap DMS-coordinate mutants into trimmed-focus coordinates and run
    ``score_fn(wt_focus_seq, remapped_mutants)``; unmappable mutants -> NaN.

    ``require_alphabet`` additionally invalidates mutants whose from/to
    letters fall outside it (models with a fixed 20-AA vocabulary)."""
    from proteingym_tpu.data.mutants import parse_mutant

    msa_start = ctx.record.MSA_start or 1
    col_to_focus = {int(c): i for i, c in enumerate(np.asarray(msa.focus_cols))}
    wt = msa.focus_seq_trimmed.upper()
    remapped, valid = [], []
    for m in mutants:
        try:
            if is_wt_row(m):
                # Literal wild-type rows score 0 (the reference's label_row
                # handling), not NaN-unmappable.
                remapped.append("")
                valid.append(True)
                continue
            toks = []
            for f, pos, t in parse_mutant(m):
                fi = col_to_focus[pos - msa_start]
                if wt[fi] != f:
                    raise KeyError(m)
                if require_alphabet is not None and (
                    f not in require_alphabet or t not in require_alphabet
                ):
                    raise KeyError(m)
                toks.append(f"{f}{fi + 1}{t}")
            remapped.append(":".join(toks))
            valid.append(True)
        except (KeyError, ValueError, IndexError):
            valid.append(False)
    valid = np.asarray(valid)
    scores = score_fn(wt, remapped)
    out = np.full(len(mutants), np.nan)
    out[valid] = np.asarray(scores)
    return out


@register_scorer("deepsequence")
@register_scorer("eve")
def score_eve(ctx: ScoreContext) -> pd.DataFrame:
    """EVE VAE: train from the MSA (or restore an orbax checkpoint), then
    evol indices over MC samples (ref EVE/compute_evol_indices_DMS.py).
    ``deepsequence`` scores with the DeepSequence-vintage architecture
    (1500-1500 encoder, z=30, 100-500 decoder — the VAE EVE descends
    from), same delta-ELBO recipe.

    ``--extra seeds=1,2,3,4,5`` trains one VAE per seed and averages the
    evol indices (the reference's 'EVE (ensemble)' column); --checkpoint
    may likewise be a comma-separated list of orbax directories."""
    import jax

    from proteingym_tpu.models import eve as eve_mod

    variant = ctx.extra.get("_scorer_name", "eve")
    if variant == "deepsequence":
        enc_default, dec_default, z_default = "1500,1500", "100,500", 30
    else:
        enc_default, dec_default, z_default = "2000,1000,300", "300,1000,2000", 50
    msa = ctx.load_msa()
    cfg = eve_mod.EveConfig(
        seq_len=msa.seq_len,
        encoder_hidden=tuple(
            int(x) for x in str(ctx.extra.get("encoder_hidden", enc_default)).split(",")
        ),
        decoder_hidden=tuple(
            int(x) for x in str(ctx.extra.get("decoder_hidden", dec_default)).split(",")
        ),
        z_dim=int(ctx.extra.get("z_dim", z_default)),
    )
    if ctx.checkpoint:
        # each entry may be an orbax dir (native training / pgym convert)
        # or a reference torch EVE checkpoint file; a converted/published
        # checkpoint's own config overrides the --extra arch knobs
        from proteingym_tpu.pipeline.checkpoints import load_eve_checkpoint

        members = []
        for p in str(ctx.checkpoint).split(","):
            params, loaded_cfg = load_eve_checkpoint(p)
            members.append(params)
            if loaded_cfg is not None:
                cfg = loaded_cfg
    else:
        seeds = (
            [int(s) for s in str(ctx.extra["seeds"]).split(",")]
            if ctx.extra.get("seeds")
            else [int(ctx.extra.get("seed", 42))]
        )
        members = [
            eve_mod.train(
                msa.one_hot(),
                msa.weights,
                cfg,
                steps=int(ctx.extra.get("train_steps", 10000)),
                seed=seed,
            )
            for seed in seeds
        ]

    # map DMS-coordinate mutants to trimmed-focus-column coordinates
    # (positions outside focus columns are unscorable -> NaN, as in the
    # reference's focus-col filtering)
    alphabet = "ACDEFGHIKLMNPQRSTVWY"
    # indeterminate focus letters (X/B/Z/U) become all-zero one-hot rows
    # downstream (code -1), matching MSA.one_hot's handling
    aa_idx = {a: i for i, a in enumerate(alphabet)}
    focus_codes = np.asarray(
        [aa_idx.get(c, -1) for c in msa.focus_seq_trimmed.upper()]
    )
    wt_onehot = np.zeros((len(focus_codes), len(alphabet)), np.float32)
    known = focus_codes >= 0
    wt_onehot[known, focus_codes[known]] = 1.0

    def score_fn(wt, remapped):
        onehots = eve_mod.onehot_mutants(focus_codes, remapped, alphabet)
        per_member = [
            eve_mod.evol_indices(
                member,
                cfg,
                wt_onehot,
                onehots,
                num_samples=int(ctx.extra.get("num_samples", 2000)),
                seed=int(ctx.extra.get("seed", 42)),
            )
            for member in members
        ]
        return np.mean(per_member, axis=0)

    col = _score_focus_model(
        ctx, msa, score_fn, ctx.dms_frame["mutant"].tolist(),
        require_alphabet=alphabet,
    )
    out = ctx.dms_frame.copy()
    name = ("DeepSequence_evol_indices" if variant == "deepsequence"
            else "evol_indices")
    if len(members) > 1:
        name += "_ensemble"
    out[name] = col
    return out


# ---------------------------------------------------------------------------
# PLM scorers (need converted checkpoints)
# ---------------------------------------------------------------------------

@register_scorer("esm")
def score_esm(ctx: ScoreContext) -> pd.DataFrame:
    """ESM2/ESM-1v masked-marginal scoring (ref esm/compute_fitness.py:282-543).

    ``--extra ensemble=spec1,spec2,...`` scores each checkpoint and
    averages (the ESM-1v 5-seed ensemble, ref :530-542); otherwise the
    single --checkpoint spec is scored. Each spec follows
    load_esm_checkpoint (preset | '<preset>:<path.pt>' | converted dir).
    """
    from proteingym_tpu.models import esm2 as esm_mod
    from proteingym_tpu.models.esm_scoring import score_assay
    from proteingym_tpu.pipeline.checkpoints import load_esm_checkpoint

    specs = (
        str(ctx.extra["ensemble"]).split(",")
        if ctx.extra.get("ensemble") else [ctx.checkpoint]
    )

    # production mesh execution: --mesh data=N,model=M shards the params
    # tensor-parallel (Megatron specs) and the chunked masked-marginal
    # batches over the data axis — same code path dryrun_multichip compiles
    mesh = None
    if ctx.extra.get("mesh"):
        from proteingym_tpu.parallel.mesh import (
            esm_param_sharding, mesh_from_spec, shard_params,
        )

        mesh = mesh_from_spec(str(ctx.extra["mesh"]))

    per_member = []
    name = None
    for spec in specs:
        params, config = load_esm_checkpoint(spec)
        name = name or config.name
        if mesh is not None:
            params = shard_params(params, esm_param_sharding(params, mesh))
            apply_fn = esm_mod.make_sharded_apply_fn(config, mesh)
        else:
            apply_fn = esm_mod.make_apply_fn(config)
        per_member.append(np.asarray(score_assay(
            lambda tokens: esm_mod.apply(params, config, tokens),
            ctx.record.target_seq,
            ctx.dms_frame["mutant"].tolist(),
            strategy=ctx.extra.get("scoring_strategy", "masked-marginals"),
            chunk=ctx.batch_size,
            window=config.max_positions,
            params=params,
            apply_fn=apply_fn,
        )))
    out = ctx.dms_frame.copy()
    column = (f"{name}_ensemble" if len(per_member) > 1
              else f"{name}_score")
    out[column] = np.mean(per_member, axis=0)
    return out


def score_esm_packed_batch(
    tasks, checkpoint: Optional[str], batch_size: int = 32,
    extra: Optional[dict] = None,
) -> Dict[str, pd.DataFrame]:
    """Cross-assay packed ESM masked-marginal scoring.

    tasks: list of (AssayRecord, dms_frame). All assays' masked rows are
    flattened into shared forward batches (models/packed_scoring.py) —
    the production fast path behind ``pgym score --packed``. Scores are
    identical to the per-assay scorer; only the batching changes.
    """
    from proteingym_tpu.models import esm2 as esm_mod
    from proteingym_tpu.models.packed_scoring import score_assays_packed
    from proteingym_tpu.pipeline.checkpoints import load_esm_checkpoint

    extra = extra or {}
    if extra.get("ensemble") or extra.get("mesh"):
        raise ValueError(
            "--packed does not combine with ensemble/mesh scoring; run "
            "those per-assay"
        )
    if extra.get("scoring_strategy", "masked-marginals") != "masked-marginals":
        raise ValueError("--packed supports masked-marginals only")
    params, config = load_esm_checkpoint(checkpoint)
    apply_fn = esm_mod.make_apply_fn(config)
    assays = [
        (rec.target_seq, frame["mutant"].tolist()) for rec, frame in tasks
    ]
    scores = score_assays_packed(
        apply_fn, params, assays, chunk=batch_size,
        window=config.max_positions,
        # opt-in k-column masking (--extra cols_per_forward=k): ~1/k the
        # forwards; k=1 (default) is the reference-exact protocol
        cols_per_forward=int(extra.get("cols_per_forward", 1)),
    )
    out = {}
    for (rec, frame), s in zip(tasks, scores):
        df = frame.copy()
        df[f"{config.name}_score"] = s
        out[rec.DMS_id] = df
    return out


@register_scorer("msa_transformer")
def score_msa_transformer(ctx: ScoreContext) -> pd.DataFrame:
    """MSA Transformer ensemble masked-marginals
    (ref esm/compute_fitness.py:355-400)."""
    import jax

    from proteingym_tpu.models import msa_transformer as mt

    config = mt.PRESETS.get(ctx.checkpoint or "", mt.MsaTransformerConfig())
    if ctx.checkpoint and ctx.checkpoint not in mt.PRESETS:
        from proteingym_tpu.pipeline.checkpoints import _load_torch_state_dict

        state, _ = _load_torch_state_dict(Path(ctx.checkpoint))
        params = mt.convert_torch_state_dict(state, config)
    else:
        params = mt.init_params(jax.random.PRNGKey(0), config)
    msa = ctx.load_msa()
    # the masked-marginal table lives in trimmed-FOCUS-COLUMN coordinates
    # (the sampled rows are focus-trimmed), so DMS-coordinate mutants must
    # be remapped before indexing it — full-sequence positions would read
    # rows shifted by MSA_start and silently clamp past MSA_end
    scores = _score_focus_model(
        ctx, msa,
        lambda wt, remapped: mt.score_assay_msa_transformer(
            params,
            config,
            wt,
            remapped,
            msa.sequences(),
            msa.weights,
            nseq=int(ctx.extra.get("msa_samples", 384)),
            seeds=tuple(range(1, 1 + int(ctx.extra.get("num_seeds", 5)))),
            chunk=max(1, ctx.batch_size // 8),
        ),
        ctx.dms_frame["mutant"].tolist(),
    )
    out = ctx.dms_frame.copy()
    out["esm_msa1b_ensemble"] = scores
    return out


@register_scorer("rita")
def score_rita(ctx: ScoreContext) -> pd.DataFrame:
    """RITA AR scoring: mirrored absolute log-lik
    (ref rita/compute_fitness.py calc_fitness)."""
    import jax

    from proteingym_tpu.models import ar_zoo
    from proteingym_tpu.models.ar_scoring import (
        score_mutants_ar, stable_params_fn,
    )

    preset = ctx.checkpoint or "RITA_s"
    config = ar_zoo.RITA_PRESETS.get(preset)
    if config is None:
        raise ValueError(f"Unknown RITA preset {preset}")
    params = ctx.extra.get("params")
    if params is None:
        params = ar_zoo.rita_init(jax.random.PRNGKey(0), config)
    tok = ar_zoo.RitaTokenizer()
    frame = score_mutants_ar(
        stable_params_fn(ar_zoo.rita_apply, config),
        tok.encode,
        pad_id=tok.PAD,
        mutants=ctx.dms_frame["mutant"].tolist(),
        mutated_sequences=ctx.dms_frame["mutated_sequence"].tolist(),
        target_seq=None,  # absolute scores (ref semantics)
        model_context_len=config.n_ctx,
        batch_size=ctx.batch_size,
        params=params,
    )
    return ctx.dms_frame.merge(
        frame.rename(columns={"avg_score": f"{config.name}_score"}),
        on="mutated_sequence", how="left",
    )


@register_scorer("protgpt2")
def score_protgpt2(ctx: ScoreContext) -> pd.DataFrame:
    """ProtGPT2 AR scoring over BPE tokens (ref protgpt2/compute_fitness.py).

    Pass --extra tokenizer=<hf dir or name> to use the real BPE vocabulary
    via transformers; the fallback byte-level encoding keeps ids inside the
    GPT-2 vocab so architecture/scoring plumbing stays exercised offline.
    """
    import jax

    from proteingym_tpu.models import ar_zoo
    from proteingym_tpu.models.ar_scoring import (
        score_mutants_ar, stable_params_fn,
    )

    config = ar_zoo.Gpt2Config(
        num_layers=int(ctx.extra.get("num_layers", 36)),
        embed_dim=int(ctx.extra.get("embed_dim", 1280)),
        num_heads=int(ctx.extra.get("num_heads", 20)),
    )
    params = ctx.extra.get("params")
    if params is None and ctx.checkpoint:
        from proteingym_tpu.pipeline.checkpoints import load_gpt2_checkpoint

        params, config = load_gpt2_checkpoint(ctx.checkpoint, config)
    if params is None:
        params = ar_zoo.gpt2_init(jax.random.PRNGKey(0), config)
    tok_name = ctx.extra.get("tokenizer")
    if tok_name:
        from transformers import AutoTokenizer

        hf_tok = AutoTokenizer.from_pretrained(tok_name)

        def tokenize(s):
            return np.asarray(hf_tok.encode(s), np.int32)

        pad_id = hf_tok.eos_token_id or 0
    else:

        def tokenize(s):
            return np.asarray([ord(c) % config.vocab_size for c in s],
                              np.int32)

        pad_id = 0
    frame = score_mutants_ar(
        stable_params_fn(ar_zoo.gpt2_apply, config),
        tokenize,
        pad_id=pad_id,
        mutants=ctx.dms_frame["mutant"].tolist(),
        mutated_sequences=ctx.dms_frame["mutated_sequence"].tolist(),
        target_seq=None,
        model_context_len=config.n_ctx,
        batch_size=ctx.batch_size,
        params=params,
    )
    return ctx.dms_frame.merge(
        frame.rename(columns={"avg_score": "ProtGPT2_score"}),
        on="mutated_sequence", how="left",
    )


@register_scorer("progen3")
def score_progen3(ctx: ScoreContext) -> pd.DataFrame:
    """ProGen3 MoE AR scoring, AA-restricted logits
    (ref progen3/compute_fitness.py; shares the ProGen2 harness)."""
    import jax

    from proteingym_tpu.models import progen3
    from proteingym_tpu.models.ar_scoring import score_mutants_ar

    preset = ctx.checkpoint or "progen3-112m"
    config = progen3.PRESETS.get(preset)
    if config is None:
        raise ValueError(f"Unknown ProGen3 preset {preset}")
    params = ctx.extra.get("params")
    if params is None:
        cfg = config
        if ctx.extra.get("tiny"):
            import dataclasses as _dc

            cfg = _dc.replace(config, num_layers=2, hidden_dim=64,
                              num_heads=4, ffn_dim=96, num_experts=4)
            config = cfg
        params = progen3.init_params(jax.random.PRNGKey(0), config)
    # ProGen3's vocabulary is the full A-Z range at offset 8 (tokenizer.json;
    # restricted_apply_fn adds the offset)
    aa_tok = {c: i for i, c in enumerate("ABCDEFGHIJKLMNOPQRSTUVWXYZ")}

    def tokenize(s):
        return np.asarray([aa_tok.get(c, aa_tok["X"]) for c in s], np.int32)

    frame = score_mutants_ar(
        progen3.restricted_apply_fn(config),
        tokenize,
        pad_id=aa_tok["X"],
        mutants=ctx.dms_frame["mutant"].tolist(),
        mutated_sequences=ctx.dms_frame["mutated_sequence"].tolist(),
        target_seq=None,
        model_context_len=config.n_ctx if hasattr(config, "n_ctx") else 1024,
        batch_size=ctx.batch_size,
        params=params,
    )
    return ctx.dms_frame.merge(
        frame.rename(columns={"avg_score": f"{config.name}_score"}),
        on="mutated_sequence", how="left",
    )


@register_scorer("progen2")
def score_progen2(ctx: ScoreContext) -> pd.DataFrame:
    """ProGen2 AR scoring: absolute mirrored log-lik over AA-restricted
    logits (ref progen2/compute_fitness.py:34-87)."""
    import jax

    from proteingym_tpu.models import ar_zoo
    from proteingym_tpu.models.ar_scoring import score_mutants_ar

    preset = ctx.checkpoint or "progen2-small"
    config = ar_zoo.PROGEN2_PRESETS.get(preset)
    if config is None:
        raise ValueError(f"Unknown ProGen2 preset {preset}")
    params = ctx.extra.get("params")
    if params is None:
        params = ar_zoo.progen2_init(jax.random.PRNGKey(0), config)
    fn = ar_zoo.progen2_restricted_apply_fn(config)
    aa_tok = {c: i for i, c in enumerate("ABCDEFGHIKLMNOPQRSTUVWXYZ")}

    def tokenize(s):
        return np.asarray([aa_tok.get(c, aa_tok["X"]) for c in s], np.int32)

    frame = score_mutants_ar(
        fn,
        tokenize,
        pad_id=aa_tok["X"],
        mutants=ctx.dms_frame["mutant"].tolist(),
        mutated_sequences=ctx.dms_frame["mutated_sequence"].tolist(),
        target_seq=None,  # absolute scores, no WT delta (ref semantics)
        model_context_len=config.n_ctx,
        batch_size=ctx.batch_size,
        params=params,
    )
    out = ctx.dms_frame.merge(
        frame.rename(columns={"avg_score": f"{config.name}_score"}),
        on="mutated_sequence",
        how="left",
    )
    return out


@register_scorer("unirep")
def score_unirep(ctx: ScoreContext) -> pd.DataFrame:
    """UniRep mLSTM AR surprisal, optional per-family evotuning
    (ref unirep/unirep_inference.py, unirep_evotune.py)."""
    import jax

    from proteingym_tpu.models import unirep as ur
    from proteingym_tpu.models.ar_scoring import batched_ar_loglik

    config = ur.UniRepConfig(
        hidden_dim=int(ctx.extra.get("hidden_dim", 1900)),
        embed_dim=int(ctx.extra.get("embed_dim", 10)),
    )
    if ctx.checkpoint:
        params = ur.convert_tf_weights(ctx.checkpoint, config)
    else:
        params = ur.init_params(jax.random.PRNGKey(0), config)
    if ctx.extra.get("evotune_steps"):
        msa = ctx.load_msa()
        params = ur.evotune(
            params, config, msa.sequences(),
            steps=int(ctx.extra["evotune_steps"]),
            weights=msa.weights,
        )
    tok = ur.UniRepTokenizer()
    seqs = ctx.dms_frame["mutated_sequence"].tolist()
    rows = [tok.encode(s) for s in seqs]
    from proteingym_tpu.models.ar_scoring import stable_params_fn

    lls = batched_ar_loglik(
        stable_params_fn(ur.apply, config), rows, tok.PAD,
        batch_size=ctx.batch_size, params=params,
    )
    out = ctx.dms_frame.copy()
    out["unirep_score"] = lls / np.asarray([len(s) for s in seqs])
    return out


@register_scorer("protein_mpnn")
def score_protein_mpnn(ctx: ScoreContext) -> pd.DataFrame:
    """ProteinMPNN: mean -NLL over decoding orders, conditioned on the
    backbone (ref protein_mpnn/compute_fitness.py:180-230)."""
    import jax

    from proteingym_tpu.data.structures import parse_pdb_backbone
    from proteingym_tpu.models import protein_mpnn as mpnn

    config = mpnn.MpnnConfig()
    if ctx.checkpoint:
        from proteingym_tpu.pipeline.checkpoints import _load_torch_state_dict

        state, _ = _load_torch_state_dict(Path(ctx.checkpoint))
        params = mpnn.convert_torch_state_dict(state, config)
    else:
        params = mpnn.init_params(jax.random.PRNGKey(0), config)
    if ctx.structure_dir is None:
        raise FileNotFoundError("protein_mpnn needs --structure-dir")
    pdb = Path(ctx.structure_dir) / f"{ctx.record.UniProt_ID}.pdb"
    if not pdb.exists():
        pdb = Path(ctx.structure_dir) / f"{ctx.record.DMS_id}.pdb"
    coords, _ = parse_pdb_backbone(pdb)
    seqs = ctx.dms_frame["mutated_sequence"].tolist()
    scores = mpnn.score_sequences(
        params, config, coords, seqs,
        n_orders=int(ctx.extra.get("num_seq_per_target", 10)),
        batch_size=ctx.batch_size,
    )
    out = ctx.dms_frame.copy()
    out["pmpnn_ll"] = scores
    return out


@register_scorer("poet")
def score_poet(ctx: ScoreContext) -> pd.DataFrame:
    """PoET family-conditioned AR scoring (ref PoET/scripts/score.py)."""
    from proteingym_tpu.models import poet

    config, params = resolve_zoo_checkpoint(
        ctx.checkpoint, poet.POET_PRESETS, "poet_tiny", poet.init_params,
        config_cls=poet.PoetConfig,
    )
    msa = ctx.load_msa()
    scores = poet.score_assay_poet(
        params,
        config,
        ctx.dms_frame["mutated_sequence"].tolist(),
        msa.sequences(),
        msa.weights,
        max_context_tokens=int(ctx.extra.get("max_context_tokens", 4096)),
        n_context_samples=int(ctx.extra.get("n_context_samples", 2)),
        batch_size=ctx.batch_size,
    )
    out = ctx.dms_frame.copy()
    out["PoET_score"] = scores
    return out


@register_scorer("tranception")
@register_scorer("trancepteve")
def score_tranception(ctx: ScoreContext) -> pd.DataFrame:
    """Tranception / TranceptEVE AR scoring with optional retrieval
    (ref tranception/score_tranception_proteingym.py:14-122,
    trancepteve/score_trancepteve.py:15-209)."""
    from proteingym_tpu.models.tranception import TranceptionConfig, init_params
    from proteingym_tpu.models.trancepteve import (
        RetrievalConfig, build_priors, score_trancepteve,
    )
    from proteingym_tpu.pipeline.checkpoints import load_tranception_checkpoint

    params, config = load_tranception_checkpoint(ctx.checkpoint)
    retrieval_type = ctx.extra.get("retrieval_type")
    msa_lp = eve_lp = None
    alpha = beta = 0.0
    rcfg = None
    if retrieval_type:
        msa = ctx.load_msa()
        rcfg = RetrievalConfig(
            retrieval_type=retrieval_type,
            msa_start=ctx.msa_start0,
            msa_end=ctx.record.MSA_end or len(ctx.record.target_seq),
            indel_mode=ctx.indel_mode,
        )
        # TranceptEVE: EVE-VAE priors from converted published checkpoints
        # (--extra eve_checkpoints=path1,path2 — torch .pt files or orbax
        # dirs via load_eve_checkpoint) (ref score_trancepteve.py:106-154)
        eve_members, eve_cfg = [], None
        if ctx.extra.get("eve_checkpoints"):
            from proteingym_tpu.pipeline.checkpoints import load_eve_checkpoint

            for p in str(ctx.extra["eve_checkpoints"]).split(","):
                m, c = load_eve_checkpoint(p)
                eve_members.append(m)
                eve_cfg = c or eve_cfg
        msa_lp, eve_lp, alpha, beta = build_priors(
            msa.sequences(), msa.weights, ctx.record.target_seq, rcfg,
            eve_params_list=eve_members or None,
            eve_config=eve_cfg,
            eve_focus_cols=msa.focus_cols,
            eve_focus_seq=msa.focus_seq_trimmed,
            eve_num_samples=int(ctx.extra.get("eve_num_samples", 20_000)),
        )
    return score_trancepteve(
        params,
        config,
        ctx.dms_frame["mutant"].tolist(),
        ctx.dms_frame["mutated_sequence"].tolist(),
        ctx.record.target_seq,
        rcfg=rcfg,
        msa_log_prior=msa_lp,
        eve_log_prior=eve_lp,
        alpha=alpha,
        beta=beta,
        batch_size=ctx.batch_size,
        indel_mode=ctx.indel_mode,
    )


# extended zoo registrations (import side effect registers them)
from proteingym_tpu.pipeline import scorers_extra  # noqa: E402,F401
