"""pgym: single CLI replacing the reference's 53 bash scoring scripts.

Subcommands mirror the pipeline layers (SURVEY.md §7 P9):

  pgym score     — run one model over one/many assays (L2)
  pgym merge     — join per-model score files per assay (L3)
  pgym evaluate  — metrics + aggregation + leaderboards (L4)
  pgym weights   — precompute MSA sequence weights (L1)
  pgym models    — list available scorers

Replaces env-var bash config (ref scripts/zero_shot_config.sh:11-106) with
flags; resume comes from the task manifest (skip-existing generalized,
ref esm/compute_fitness.py:365-370), observability from JSONL telemetry.
"""

from __future__ import annotations

import argparse
import contextlib
import sys
from pathlib import Path

import numpy as np
import pandas as pd


def _parse_extra(pairs):
    out = {}
    for pair in pairs or []:
        k, _, v = pair.partition("=")
        for cast in (int, float):
            try:
                v = cast(v)
                break
            except (TypeError, ValueError):
                continue
        out[k] = v
    return out


def _load_registry_arg(config_path, dataset, mutation_type,
                       constants_path=None):
    """--config points at a ProteinGym-format config.json; when omitted the
    packaged registry (proteingym_tpu/configs/registry.json) is used."""
    from proteingym_tpu.data.registry import load_packaged_registry, load_registry

    if config_path:
        return load_registry(
            config_path, dataset=dataset, mutation_type=mutation_type,
            constants_path=constants_path,
        )
    return load_packaged_registry(dataset, mutation_type)


def cmd_score(args) -> int:
    from proteingym_tpu.data.reference import load_reference
    from proteingym_tpu.pipeline.manifest import Manifest
    from proteingym_tpu.pipeline.scorers import SCORERS, ScoreContext
    from proteingym_tpu.pipeline.telemetry import EventLog

    if args.model not in SCORERS:
        print(f"Unknown model '{args.model}'. Available: {sorted(SCORERS)}")
        return 2
    reference = load_reference(args.dms_reference)
    if args.dms_id:
        records = [reference[args.dms_id]]
    elif args.dms_index is not None:
        records = [reference[args.dms_index]]
    else:
        records = list(reference)

    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    log = EventLog(output_dir / "events.jsonl", echo=not args.quiet)
    manifest = Manifest(output_dir / "manifest.jsonl")
    scorer = SCORERS[args.model]

    from proteingym_tpu.pipeline.profiler import Throughput, trace

    throughput = Throughput(event_log=log)
    profile_ctx = (
        trace(args.profile_dir) if getattr(args, "profile_dir", None)
        else contextlib.nullcontext()
    )

    if getattr(args, "packed", False):
        return _cmd_score_packed(
            args, records, output_dir, log, manifest, throughput,
            profile_ctx,
        )

    failures = 0
    with profile_ctx:
        for rec in records:
            task = f"{args.model}/{rec.DMS_id}"
            out_path = output_dir / f"{rec.DMS_id}.csv"
            if (manifest.is_done(task) and out_path.exists()
                    and not args.overwrite):
                log.emit("task_skipped", task=task)
                continue
            dms_path = Path(args.dms_dir) / (
                rec.DMS_filename or f"{rec.DMS_id}.csv"
            )
            if not dms_path.exists():
                log.emit("task_missing_input", task=task, path=str(dms_path))
                continue
            try:  # per-assay isolation covers input loading too: a bad CSV
                # or WT-mismatched mutant must not abort the other assays
                dms_frame = pd.read_csv(dms_path)
                if ("mutated_sequence" not in dms_frame
                        and "mutant" in dms_frame):
                    from proteingym_tpu.data.mutants import apply_mutant

                    dms_frame["mutated_sequence"] = [
                        apply_mutant(rec.target_seq, m)
                        for m in dms_frame["mutant"]
                    ]
                # clinical reference rows name a per-protein EVE
                # checkpoint (EVE_model_path column, ref
                # reference_files/clinical_substitutions.csv); with
                # --checkpoint-root the per-record path overrides the
                # global --checkpoint
                checkpoint = args.checkpoint
                eve_path = (rec.raw or {}).get("EVE_model_path")
                if getattr(args, "checkpoint_root", None):
                    if eve_path is None or (isinstance(eve_path, float)
                                            and pd.isna(eve_path)):
                        log.emit("task_missing_input", task=task,
                                 path="EVE_model_path (reference column)")
                        continue
                    checkpoint = str(Path(args.checkpoint_root)
                                     / str(eve_path))
                ctx = ScoreContext(
                    record=rec,
                    dms_frame=dms_frame,
                    msa_dir=Path(args.msa_dir) if args.msa_dir else None,
                    weights_dir=(
                        Path(args.weights_dir) if args.weights_dir else None
                    ),
                    checkpoint=checkpoint,
                    structure_dir=(
                        Path(args.structure_dir) if args.structure_dir
                        else None
                    ),
                    indel_mode=args.indel_mode,
                    batch_size=args.batch_size,
                    extra={"_scorer_name": args.model,
                           **({"mesh": args.mesh} if getattr(args, "mesh", None)
                              else {}),
                           **_parse_extra(args.extra)},
                )
                with log.phase("score", task=task,
                               n_mutants=len(dms_frame)), \
                        throughput.measure(len(dms_frame), label=task):
                    scores = scorer(ctx)
                scores.to_csv(out_path, index=False)
                manifest.mark_done(task, rows=len(scores))
            except Exception as e:  # noqa: BLE001 — per-assay isolation
                failures += 1
                manifest.mark_failed(task, error=repr(e))
                log.emit("task_failed", task=task, error=repr(e))
                if args.fail_fast:
                    raise
    if throughput.total_mutants:
        log.emit("throughput_summary", **throughput.summary())
    return 1 if failures else 0


def _cmd_score_packed(args, records, output_dir, log, manifest,
                      throughput, profile_ctx) -> int:
    """Cross-assay packed scoring: all pending assays' masked rows share
    forward batches (pgym score --packed, ESM masked-marginals only)."""
    from proteingym_tpu.pipeline.scorers import score_esm_packed_batch

    if args.model != "esm":
        print("--packed currently supports --model esm")
        return 2
    tasks = []
    for rec in records:
        task = f"{args.model}/{rec.DMS_id}"
        out_path = output_dir / f"{rec.DMS_id}.csv"
        if manifest.is_done(task) and out_path.exists() and not args.overwrite:
            log.emit("task_skipped", task=task)
            continue
        dms_path = Path(args.dms_dir) / (rec.DMS_filename or f"{rec.DMS_id}.csv")
        if not dms_path.exists():
            log.emit("task_missing_input", task=task, path=str(dms_path))
            continue
        try:
            tasks.append((rec, pd.read_csv(dms_path)))
        except Exception as e:  # noqa: BLE001 — per-assay input isolation
            manifest.mark_failed(task, error=repr(e))
            log.emit("task_failed", task=task, error=repr(e))
    if not tasks:
        return 0
    n_total = sum(len(f) for _, f in tasks)
    try:
        with profile_ctx, \
                log.phase("score_packed", n_assays=len(tasks),
                          n_mutants=n_total), \
                throughput.measure(n_total, label=f"packed/{len(tasks)}"):
            outputs = score_esm_packed_batch(
                tasks, args.checkpoint, batch_size=args.batch_size,
                extra=_parse_extra(args.extra),
            )
    except Exception as e:  # noqa: BLE001 — batch-level failure
        for rec, _ in tasks:
            manifest.mark_failed(f"{args.model}/{rec.DMS_id}", error=repr(e))
        log.emit("task_failed", task="packed_batch", error=repr(e))
        if args.fail_fast:
            raise
        return 1
    for rec, _ in tasks:
        df = outputs[rec.DMS_id]
        df.to_csv(output_dir / f"{rec.DMS_id}.csv", index=False)
        manifest.mark_done(f"{args.model}/{rec.DMS_id}", rows=len(df))
    if throughput.total_mutants:
        log.emit("throughput_summary", **throughput.summary())
    return 0


def cmd_merge(args) -> int:
    from proteingym_tpu.data.reference import load_reference
    from proteingym_tpu.data.registry import load_registry
    from proteingym_tpu.merge.merge import filesystem_loaders, merge_all

    reference = load_reference(args.dms_reference)
    registry = _load_registry_arg(args.config, args.dataset, args.mutation_type)
    dms_loader, score_loader = filesystem_loaders(args.dms_dir, args.scores_root)
    merge_all(
        reference,
        registry,
        dms_loader,
        score_loader,
        args.output_dir,
        mutation_type=args.mutation_type,
    )
    return 0


def cmd_evaluate(args) -> int:
    from proteingym_tpu.data.reference import load_reference
    from proteingym_tpu.data.registry import load_registry
    from proteingym_tpu.metrics.aggregate import (
        directory_scores_loader, evaluate_benchmark,
    )

    reference = load_reference(args.dms_reference)
    registry = _load_registry_arg(
        args.config, args.dataset, args.mutation_type,
        constants_path=args.constants,
    )
    evaluate_benchmark(
        reference,
        registry,
        directory_scores_loader(args.merged_dir),
        args.output_dir,
        indel_mode=args.mutation_type == "indels",
        bootstrap_samples=args.bootstrap_samples,
        write_html=not args.no_html,
    )
    return 0


def cmd_merge_supervised(args) -> int:
    from proteingym_tpu.data.reference import load_reference
    from proteingym_tpu.data.registry import load_registry
    from proteingym_tpu.merge.supervised import (
        merge_supervised, supervised_filesystem_loaders,
    )

    reference = load_reference(args.dms_reference)
    registry = _load_registry_arg(
        args.config, "DMS_supervised", args.mutation_type
    )
    dms_loader, score_loader = supervised_filesystem_loaders(
        args.dms_dir, args.scores_root
    )
    merge_supervised(
        reference,
        registry,
        dms_loader,
        score_loader,
        output_dir=args.output_dir,
        mutation_type=args.mutation_type,
    )
    return 0


def cmd_evaluate_supervised(args) -> int:
    import json

    import pandas as pd

    from proteingym_tpu.data.reference import load_reference
    from proteingym_tpu.metrics.supervised import evaluate_supervised

    reference = load_reference(args.dms_reference)
    long_scores = pd.read_csv(args.input_scoring_file)
    kwargs = {}
    if args.constants:
        with open(args.constants) as f:
            constants = json.load(f)
        kwargs = dict(
            clean_names=constants.get("supervised_clean_names"),
            model_types=constants.get("supervised_model_types"),
            model_references=constants.get("supervised_model_references"),
            model_details=constants.get("supervised_model_details"),
        )
    evaluate_supervised(
        long_scores,
        reference,
        args.output_dir,
        mutation_type=args.mutation_type,
        top_model=args.top_model,
        bootstrap_samples=args.bootstrap_samples,
        write_html=not args.no_html,
        **kwargs,
    )
    return 0


def cmd_evaluate_clinical(args) -> int:
    from proteingym_tpu.data.reference import load_reference
    from proteingym_tpu.data.registry import load_registry
    from proteingym_tpu.metrics.aggregate import directory_scores_loader
    from proteingym_tpu.metrics.clinical import evaluate_clinical

    reference = load_reference(args.clinical_reference)
    registry = _load_registry_arg(args.config, "clinical", args.mutation_type)
    evaluate_clinical(
        reference,
        registry,
        directory_scores_loader(args.merged_dir),
        args.output_dir,
        mutation_type=args.mutation_type,
        label_column=args.label_column,
        bootstrap_samples=args.bootstrap_samples,
        write_html=not args.no_html,
    )
    return 0


def cmd_train(args) -> int:
    """Train an alignment model (EVE VAE / Potts PLM) and checkpoint it
    (the reference's training_EVE_models.sh role, ref train_VAE.py)."""
    from proteingym_tpu.data.reference import load_reference
    from proteingym_tpu.pipeline.scorers import ScoreContext

    reference = load_reference(args.dms_reference)
    rec = (
        reference[args.dms_id]
        if args.dms_id
        else reference[args.dms_index or 0]
    )
    ctx = ScoreContext(
        record=rec,
        dms_frame=pd.DataFrame(),
        msa_dir=Path(args.msa_dir),
        weights_dir=Path(args.weights_dir) if args.weights_dir else None,
    )
    msa = ctx.load_msa()
    out_dir = Path(args.output_dir) / f"{args.model}_{rec.DMS_id}_seed{args.seed}"

    if args.model == "eve":
        import jax

        from proteingym_tpu.models import eve as eve_mod
        from proteingym_tpu.pipeline.checkpoints import save_pytree

        cfg = eve_mod.EveConfig(seq_len=msa.seq_len)
        params = eve_mod.train(
            msa.one_hot(), msa.weights, cfg,
            steps=args.steps, seed=args.seed,
        )
        save_pytree(params, out_dir)
        print(f"EVE checkpoint -> {out_dir}")
    elif args.model == "potts":
        from proteingym_tpu.models.potts import train_potts_plm, write_plmc_model

        model = train_potts_plm(
            msa.matrix, msa.weights, "-ACDEFGHIKLMNPQRSTVWY",
            np.asarray(msa.focus_cols) + (rec.MSA_start or 1),
            msa.focus_seq_trimmed, steps=args.steps,
        )
        out_dir.parent.mkdir(parents=True, exist_ok=True)
        write_plmc_model(model, str(out_dir) + ".model")
        print(f"Potts model -> {out_dir}.model")
    else:
        print(f"Unknown trainable model {args.model}")
        return 2
    return 0


def cmd_supervised_score(args) -> int:
    """Run a native supervised baseline over assays, writing the
    scores_root/<cv_scheme>/<location>/<DMS_id>.csv layout that
    merge-supervised consumes."""
    from proteingym_tpu.data.reference import load_reference
    from proteingym_tpu.models.supervised_baselines import (
        run_supervised_baseline,
    )

    reference = load_reference(args.dms_reference)
    records = (
        [reference[args.dms_id]] if args.dms_id else list(reference)
    )

    from proteingym_tpu.models.supervised_baselines import (
        load_aug_scores, make_embedding_feature_fn,
    )

    feature_fn = None
    model = args.model
    if model.lower() in ("embeddings_ridge", "embeddings"):
        model = "embeddings_ridge"
        feature_fn = make_embedding_feature_fn(args.checkpoint)

    out_root = Path(args.output_dir)
    for rec in records:
        dms_path = Path(args.dms_dir) / (rec.DMS_filename or f"{rec.DMS_id}.csv")
        if not dms_path.exists():
            print(f"missing {dms_path}; skipping")
            continue
        frame = pd.read_csv(dms_path)
        aux = None
        if args.aug_col:
            aux = frame[args.aug_col].to_numpy(float)
        elif args.aug_scores_dir:
            spath = Path(args.aug_scores_dir) / f"{rec.DMS_id}.csv"
            if spath.exists():
                aux = load_aug_scores(frame, spath, args.aug_score_col)
            else:
                print(f"no zero-shot scores for {rec.DMS_id}; "
                      "running unaugmented")
        results = run_supervised_baseline(
            frame, rec.target_seq, model=model, lam=args.lam,
            feature_fn=feature_fn, aux=aux,
        )
        for scheme, preds in results.items():
            d = out_root / scheme / args.model.lower()
            d.mkdir(parents=True, exist_ok=True)
            preds.to_csv(d / f"{rec.DMS_id}.csv", index=False)
    return 0


def cmd_weights(args) -> int:
    from proteingym_tpu.msa.parser import load_msa
    from proteingym_tpu.msa.weights import sequence_weights

    msa = load_msa(args.msa)
    w = sequence_weights(msa.matrix, theta=args.theta)
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    np.save(args.output, w)
    print(f"N={len(w)} Neff={w.sum():.2f} -> {args.output}")
    return 0


def cmd_models(args) -> int:
    from proteingym_tpu.pipeline.scorers import SCORERS

    for name in sorted(SCORERS):
        print(name)
    return 0


CONVERTERS = {
    "esm", "msa_transformer", "esmc", "tranception", "poet",
    "protein_mpnn", "progen2", "rita", "unirep", "eve", "protgpt2",
    "progen3", "esm_if1", "protssn", "esm3", "esm3_structure_encoder",
    "s3f", "prosst", "prosst_quantizer", "carp", "saprot", "mulan",
    "vespag", "prot_t5", "vespa_conscnn",
}


def cmd_download(args) -> int:
    from proteingym_tpu.data.download import (
        RESOURCES, count_resources, download_resources,
    )

    if args.list_only:
        for name, filename, sha, _raw in RESOURCES:
            print(f"{name:45s} {filename:55s} sha256:{sha[:12]}…")
        return 0
    out = download_resources(
        names=args.resources or None,
        cache=args.cache,
        remove_zip=not args.keep_zip,
        force=args.force,
    )
    for name, desc in count_resources(out).items():
        print(f"{name}: {desc}")
    return 0


def cmd_convert(args) -> int:
    """torch/TF checkpoint -> our pytree, persisted with orbax."""
    from proteingym_tpu.pipeline.checkpoints import (
        _load_torch_state_dict, save_pytree,
    )

    fam, preset = args.family, args.preset

    def sd():
        state, _cfg = _load_torch_state_dict(Path(args.checkpoint))
        return state

    if fam == "esm":
        from proteingym_tpu.models import esm2 as m

        config = m.PRESETS[preset]
        params = m.convert_torch_state_dict(sd(), config)
    elif fam == "msa_transformer":
        from proteingym_tpu.models import msa_transformer as m

        config = m.PRESETS.get(preset) or m.MsaTransformerConfig()
        params = m.convert_torch_state_dict(sd(), config)
    elif fam == "esmc":
        from proteingym_tpu.models import esmc as m

        config = m.PRESETS[preset]
        params = m.convert_torch_state_dict(sd(), config)
    elif fam == "tranception":
        from proteingym_tpu.models import tranception as m

        config = m.PRESETS[preset]
        params = m.convert_torch_state_dict(sd(), config)
    elif fam == "poet":
        from proteingym_tpu.models import poet as m

        config = m.POET_PRESETS[preset]
        params = m.convert_torch_state_dict(sd(), config)
    elif fam == "protein_mpnn":
        from proteingym_tpu.models import protein_mpnn as m

        config = m.MpnnConfig()
        params = m.convert_torch_state_dict(sd(), config)
    elif fam == "progen2":
        from proteingym_tpu.models import ar_zoo as m

        config = m.PROGEN2_PRESETS[preset]
        params = m.progen2_convert_torch_state_dict(sd(), config)
    elif fam == "rita":
        from proteingym_tpu.models import ar_zoo as m

        config = m.RITA_PRESETS[preset]
        params = m.rita_convert_torch_state_dict(sd(), config)
    elif fam == "unirep":
        from proteingym_tpu.models import unirep as m

        config = m.UniRepConfig()
        params = m.convert_tf_weights(args.checkpoint, config)
    elif fam == "progen3":
        from proteingym_tpu.models import progen3 as m

        hf_cfg = Path(args.checkpoint).parent / "config.json"
        if Path(args.checkpoint).is_dir():
            hf_cfg = Path(args.checkpoint) / "config.json"
        if preset in m.PRESETS:
            config = m.PRESETS[preset]
        elif hf_cfg.exists():
            # published sizes without a hand-written preset (219m, 762m):
            # derive dims from the HF config.json next to the weights
            config = m.config_from_hf_json(hf_cfg, name=preset or "progen3")
        else:
            raise SystemExit(
                f"progen3: unknown preset {preset!r} and no config.json "
                f"found at {hf_cfg}"
            )
        params = m.convert_torch_state_dict(sd(), config)
    elif fam == "protgpt2":
        from proteingym_tpu.pipeline.checkpoints import load_gpt2_checkpoint

        params, config = load_gpt2_checkpoint(args.checkpoint)
    elif fam == "esm_if1":
        from proteingym_tpu.models import gvp_transformer as m

        config = m.PRESETS.get(preset) or m.PRESETS["esm_if1"]
        params = m.convert_torch_state_dict(sd(), config)
    elif fam == "protssn":
        from proteingym_tpu.models import protssn as m

        base = m.PROTSSN_PRESETS.get(preset) or m.ProtssnEgnnConfig()
        state = sd()
        config = m.config_from_state_dict(state, base)
        params = m.convert_torch_state_dict(state, config)
    elif fam == "esm3":
        from proteingym_tpu.models import esm3 as m

        config = (m.PRESETS | {"esm3_tiny": m.TINY}).get(preset) \
            or m.PRESETS["esm3_open_small"]
        params = m.convert_torch_state_dict(sd(), config)
    elif fam == "s3f":
        from proteingym_tpu.models import s3f as m

        config = m.S3F_PRESETS.get(preset) or m.S3F_PRESETS["s3f"]
        params = m.convert_torch_state_dict_gvpgnn(sd(), config)
    elif fam == "prosst":
        from proteingym_tpu.models import prosst as m

        config = m.PROSST_PRESETS.get(preset) or m.PROSST_PRESETS[
            "prosst_2048"]
        params = m.convert_hf_state_dict(sd(), config)
    elif fam == "carp":
        from proteingym_tpu.models import carp as m

        config = m.CARP_PRESETS.get(preset) or m.CARP_PRESETS["carp_640M"]
        params = m.convert_torch_state_dict(sd(), config)
    elif fam == "saprot":
        from proteingym_tpu.models import saprot as m

        config = m.saprot_config(preset or "saprot_650M")
        params = m.convert_torch_state_dict(sd(), config)
    elif fam == "mulan":
        import jax.numpy as jnp

        from proteingym_tpu.models import esm2 as esm2_mod
        from proteingym_tpu.models import mulan as m

        import dataclasses as _dc

        trunk = {
            "mulan_small": "esm2_t12_35M",
        }.get(preset, "esm2_t12_35M")
        config = m.MulanConfig(
            name=preset or "mulan_small",
            esm=_dc.replace(esm2_mod.PRESETS[trunk], dtype=jnp.float32),
        )
        params = m.convert_torch_state_dict(sd(), config)
    elif fam == "esm3_structure_encoder":
        from proteingym_tpu.models import esm3 as m

        config = m.STRUCTURE_ENCODER_PRESETS.get(preset) \
            or m.STRUCTURE_ENCODER_PRESETS["esm3_structure_encoder"]
        params = m.convert_structure_encoder_state_dict(sd(), config)
    elif fam == "prosst_quantizer":
        # the structure-token GVP encoder (published AE.pt,
        # ref prosst/structure/quantizer.py:523-531); k-means centroids
        # ride separately as .npy/.joblib via the scorer's
        # --extra quantizer_centroids=
        from proteingym_tpu.models import prosst_quantizer as m

        state = sd()
        config = m.config_from_state_dict(state)
        params = m.convert_torch_state_dict(state, config)
    elif fam == "vespag":
        # self-describing: architecture (fnn/cnn/combined) is detected from
        # the state_dict key layout (the published state_dict_v2.pt is the
        # default FNN, ref vespag/utils/utils.py:17-21); preset is recorded
        # but unused
        from proteingym_tpu.models import vespag as m

        params = m.convert_torch_state_dict(sd())
        config = m.VespagArchConfig(arch=params.pop("arch"))
    elif fam == "vespa_conscnn":
        # the vespa package's ProtT5 conservation CNN (prott5cons
        # checkpoint); self-describing — the two Conv2d layers are found
        # by key layout (models/vespa_heads.py)
        from proteingym_tpu.models import vespa_heads as m

        params = m.convert_conscnn_state_dict(sd())
        config = None
    elif fam == "prot_t5":
        # HF T5EncoderModel state dict (Rostlab/prot_t5_xl_uniref50, the
        # VESPA trunk); self-describing — dims read from the weights
        from proteingym_tpu.models import prot_t5 as m

        state = sd()
        config = m.config_from_state_dict(state, name=preset or "prot_t5")
        params = m.convert_torch_state_dict(state, config)
    elif fam == "eve":
        # self-describing checkpoint: the reference save dict carries the
        # encoder/decoder hyperparameters (ref VAE_model.py:356-364), so the
        # preset argument is ignored
        from proteingym_tpu.models import eve as m

        params, config = m.load_torch_checkpoint(args.checkpoint)
    else:  # pragma: no cover — argparse choices guard this
        raise ValueError(fam)
    # layout the loaders expect: <out>/params (orbax) + config.json sidecar
    import dataclasses as _dc
    import json as _json

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    save_pytree(params, out / "params")
    sidecar = {"family": fam, "preset": preset}
    if _dc.is_dataclass(config):
        for k, v in _dc.asdict(config).items():
            if isinstance(v, (int, float, str, bool, type(None), list, tuple)):
                sidecar[k] = list(v) if isinstance(v, tuple) else v
    (out / "config.json").write_text(_json.dumps(sidecar, indent=1))
    print(f"converted {fam}/{preset} -> {out} (params/ + config.json)")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pgym", description=__doc__)
    p.add_argument(
        "--platform", default=None, choices=["cpu", "tpu"],
        help="force the JAX backend (site configs may preselect a tunneled "
             "TPU; --platform cpu makes merge/evaluate runs deterministic "
             "and avoids contending for the single chip)",
    )
    p.add_argument(
        "--compile-cache", default=None, metavar="DIR",
        help="persistent XLA compilation cache directory (reuses compiled "
             "executables across pgym invocations)",
    )
    sub = p.add_subparsers(dest="command", required=True)

    s = sub.add_parser("score", help="score assays with one model")
    s.add_argument("--model", required=True)
    s.add_argument("--checkpoint", default=None)
    s.add_argument("--checkpoint-root", default=None, metavar="DIR",
                   help="per-protein checkpoint routing: resolve each "
                        "record's checkpoint as DIR/<EVE_model_path> from "
                        "the reference file (the clinical reference's "
                        "EVE_model_path column, ref "
                        "reference_files/clinical_substitutions.csv); "
                        "records without the column are skipped")
    s.add_argument("--dms-reference", required=True)
    s.add_argument("--dms-dir", required=True)
    s.add_argument("--dms-id", default=None)
    s.add_argument("--dms-index", type=int, default=None)
    s.add_argument("--msa-dir", default=None)
    s.add_argument("--weights-dir", default=None)
    s.add_argument("--structure-dir", default=None)
    s.add_argument("--output-dir", required=True)
    s.add_argument("--batch-size", type=int, default=32)
    s.add_argument("--indel-mode", action="store_true")
    s.add_argument("--mesh", default=None, metavar="SPEC",
                   help="device mesh for sharded scoring, e.g. "
                        "'data=4,model=2' (tensor-parallel params + "
                        "data-parallel mutant chunks)")
    s.add_argument("--profile-dir", default=None, metavar="DIR",
                   help="capture a jax.profiler device trace of the "
                        "scoring run (TensorBoard-compatible)")
    s.add_argument("--packed", action="store_true",
                   help="cross-assay packed scoring: masked rows from all "
                        "selected assays share forward batches (ESM "
                        "masked-marginals; the production throughput path)")
    s.add_argument("--overwrite", action="store_true")
    s.add_argument("--fail-fast", action="store_true")
    s.add_argument("--quiet", action="store_true")
    s.add_argument("--extra", nargs="*", metavar="KEY=VAL")
    s.set_defaults(fn=cmd_score)

    m = sub.add_parser("merge", help="merge per-model scores per assay")
    m.add_argument("--dms-reference", required=True)
    m.add_argument("--dms-dir", required=True)
    m.add_argument("--scores-root", required=True)
    m.add_argument("--config", default=None)
    m.add_argument("--output-dir", required=True)
    m.add_argument("--dataset", default="DMS")
    m.add_argument("--mutation-type", default="substitutions",
                   choices=["substitutions", "indels"])
    m.set_defaults(fn=cmd_merge)

    e = sub.add_parser("evaluate", help="metrics + leaderboards")
    e.add_argument("--dms-reference", required=True)
    e.add_argument("--merged-dir", required=True)
    e.add_argument("--config", default=None)
    e.add_argument("--constants", default=None)
    e.add_argument("--output-dir", required=True)
    e.add_argument("--dataset", default="DMS")
    e.add_argument("--mutation-type", default="substitutions",
                   choices=["substitutions", "indels"])
    e.add_argument("--bootstrap-samples", type=int, default=10000)
    e.add_argument("--no-html", action="store_true")
    e.set_defaults(fn=cmd_evaluate)

    ms = sub.add_parser("merge-supervised", help="merge supervised CV scores")
    ms.add_argument("--dms-reference", required=True)
    ms.add_argument("--dms-dir", required=True)
    ms.add_argument("--scores-root", required=True)
    ms.add_argument("--config", default=None)
    ms.add_argument("--output-dir", required=True)
    ms.add_argument("--mutation-type", default="substitutions",
                    choices=["substitutions", "indels"])
    ms.set_defaults(fn=cmd_merge_supervised)

    es = sub.add_parser("evaluate-supervised",
                        help="supervised Spearman/MSE leaderboards")
    es.add_argument("--dms-reference", required=True)
    es.add_argument("--input-scoring-file", required=True,
                    help="long-format merged scores CSV")
    es.add_argument("--constants", default=None)
    es.add_argument("--output-dir", required=True)
    es.add_argument("--mutation-type", default="substitutions",
                    choices=["substitutions", "indels"])
    es.add_argument("--top-model", default=None)
    es.add_argument("--bootstrap-samples", type=int, default=10000)
    es.add_argument("--no-html", action="store_true")
    es.set_defaults(fn=cmd_evaluate_supervised)

    ec = sub.add_parser("evaluate-clinical", help="clinical AUC leaderboard")
    ec.add_argument("--clinical-reference", required=True)
    ec.add_argument("--merged-dir", required=True)
    ec.add_argument("--config", default=None)
    ec.add_argument("--output-dir", required=True)
    ec.add_argument("--mutation-type", default="substitutions",
                    choices=["substitutions", "indels"])
    ec.add_argument("--label-column", default=None)
    ec.add_argument("--bootstrap-samples", type=int, default=10000)
    ec.add_argument("--no-html", action="store_true")
    ec.set_defaults(fn=cmd_evaluate_clinical)

    w = sub.add_parser("weights", help="precompute MSA sequence weights")
    w.add_argument("--msa", required=True)
    w.add_argument("--theta", type=float, default=0.2)
    w.add_argument("--output", required=True)
    w.set_defaults(fn=cmd_weights)

    tr = sub.add_parser("train", help="train an alignment model (eve/potts)")
    tr.add_argument("--model", required=True, choices=["eve", "potts"])
    tr.add_argument("--dms-reference", required=True)
    tr.add_argument("--dms-id", default=None)
    tr.add_argument("--dms-index", type=int, default=None)
    tr.add_argument("--msa-dir", required=True)
    tr.add_argument("--weights-dir", default=None)
    tr.add_argument("--output-dir", required=True)
    tr.add_argument("--steps", type=int, default=400_000)
    tr.add_argument("--seed", type=int, default=0)
    tr.set_defaults(fn=cmd_train)

    ss = sub.add_parser("supervised-score",
                        help="native supervised baselines (per CV scheme)")
    ss.add_argument("--model", default="OHE_ridge",
                    help="OHE_ridge | embeddings_ridge | ProteinNPT")
    ss.add_argument("--dms-reference", required=True)
    ss.add_argument("--dms-dir", required=True)
    ss.add_argument("--dms-id", default=None)
    ss.add_argument("--output-dir", required=True)
    ss.add_argument("--lam", type=float, default=1.0)
    ss.add_argument("--checkpoint", default=None,
                    help="trunk for embeddings_ridge (preset or converted)")
    ss.add_argument("--aug-col", default=None,
                    help="zero-shot column in the assay CSV appended as an "
                         "'Augmented' ridge feature")
    ss.add_argument("--aug-scores-dir", default=None,
                    help="directory of per-assay zero-shot score CSVs "
                         "(<DMS_id>.csv, joined on mutant) for augmentation")
    ss.add_argument("--aug-score-col", default=None)
    ss.set_defaults(fn=cmd_supervised_score)

    dl = sub.add_parser(
        "download",
        help="fetch + SHA256-verify + unzip benchmark resources",
    )
    dl.add_argument("--resources", nargs="*", default=None,
                    help="resource names (default: all)")
    dl.add_argument("--cache", default=None, help="extraction directory")
    dl.add_argument("--force", action="store_true")
    dl.add_argument("--keep-zip", action="store_true")
    dl.add_argument("--list", action="store_true", dest="list_only",
                    help="print the resource table and exit")
    dl.set_defaults(fn=cmd_download)

    cv = sub.add_parser(
        "convert",
        help="convert a torch/TF checkpoint to an orbax pytree",
    )
    cv.add_argument("--family", required=True,
                    choices=sorted(CONVERTERS))
    cv.add_argument("--checkpoint", required=True,
                    help="torch .pt/.bin state_dict path (UniRep: TF dir)")
    cv.add_argument("--preset", required=True,
                    help="architecture preset name for the family")
    cv.add_argument("--output", required=True,
                    help="output orbax checkpoint directory")
    cv.set_defaults(fn=cmd_convert)

    lm = sub.add_parser("models", help="list available scorers")
    lm.set_defaults(fn=cmd_models)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform or args.compile_cache:
        import jax

        if args.platform:
            jax.config.update("jax_platforms", args.platform)
        if args.compile_cache:
            jax.config.update("jax_compilation_cache_dir", args.compile_cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
