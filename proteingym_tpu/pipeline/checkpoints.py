"""Checkpoint IO: orbax pytree persistence + torch->JAX converters.

Replaces the reference's torch state_dict checkpoints
(ref: EVE/VAE_model.py:300-330 torch.save; HF from_pretrained for
Tranception/ESM) with orbax for natively-trained models and on-the-fly
conversion for published PyTorch checkpoints.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Optional, Tuple


def save_pytree(params: Any, path: str | Path) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def restore_pytree(path: str | Path) -> Any:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path)


def _load_torch_state_dict(path: Path):
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model" in blob:  # fairseq/ESM layout
        return blob["model"], blob.get("cfg") or blob.get("args")
    if isinstance(blob, dict) and "model_state_dict" in blob:  # EVE layout
        return blob["model_state_dict"], None
    return blob, None


def load_esm_checkpoint(spec: str) -> Tuple[Any, Any]:
    """Resolve an ESM checkpoint spec to (params, EsmConfig).

    spec is one of:
      - a preset name ("esm2_t33_650M", ...) -> random init (tests/bench)
      - "<preset>:<path.pt>"  -> convert the torch checkpoint
      - a directory produced by save_pytree with a config.json sidecar
    """
    from proteingym_tpu.models import esm2

    if spec is None:
        raise ValueError(
            "esm scoring needs --checkpoint: a preset name (random init, "
            f"e.g. one of {sorted(esm2.PRESETS)}), '<preset>:<path.pt>', a "
            "fair-esm .pt file, or a 'pgym convert' output directory"
        )
    if spec in esm2.PRESETS:
        import jax

        config = esm2.PRESETS[spec]
        return esm2.init_params(jax.random.PRNGKey(0), config), config
    if ":" in spec:
        preset, path = spec.split(":", 1)
        # torch checkpoint names encode the preset when not given explicitly
        preset = preset or _esm_preset_from_filename(path)
        config = esm2.PRESETS[preset]
        state, _ = _load_torch_state_dict(Path(path))
        return esm2.convert_torch_state_dict(state, config), config
    path = Path(spec)
    if path.suffix == ".pt":
        preset = _esm_preset_from_filename(spec)
        config = esm2.PRESETS[preset]
        state, _ = _load_torch_state_dict(path)
        return esm2.convert_torch_state_dict(state, config), config
    with open(path / "config.json") as f:
        cfg = json.load(f)
    if cfg.get("preset") in esm2.PRESETS:  # pgym convert sidecar
        config = esm2.PRESETS[cfg["preset"]]
    else:
        import dataclasses as _dc

        fields = {f.name for f in _dc.fields(esm2.EsmConfig)}
        config = esm2.EsmConfig(
            **{k: v for k, v in cfg.items() if k in fields}
        )
    return restore_pytree(path / "params"), config


def _esm_preset_from_filename(path: str) -> str:
    from proteingym_tpu.models import esm2

    stem = Path(path).stem
    for preset in esm2.PRESETS:
        token = preset.rsplit("_", 1)[0]  # esm2_t33 / esm1v_t33 ...
        if stem.startswith(token):
            return preset
    raise ValueError(f"Cannot infer ESM preset from {path}")


def load_tranception_checkpoint(spec: Optional[str]) -> Tuple[Any, Any]:
    """Resolve a Tranception checkpoint spec to (params, TranceptionConfig).

    spec: HF-style directory (config.json + pytorch_model.bin), an orbax
    directory with config sidecar, or a preset name (Small/Medium/Large)
    for random init.
    """
    import jax

    from proteingym_tpu.models import tranception as tr

    presets = {
        "Small": tr.TranceptionConfig("Tranception_Small", 12, 768, 12),
        "Medium": tr.TranceptionConfig("Tranception_Medium", 24, 1024, 16),
        "Large": tr.TranceptionConfig("Tranception_Large", 36, 1280, 20),
    }
    if spec is None or spec in presets:
        config = presets.get(spec) or tr.TranceptionConfig(
            "Tranception_tiny", 2, 64, 4
        )
        return tr.init_params(jax.random.PRNGKey(0), config), config
    path = Path(spec)
    if (path / "pytorch_model.bin").exists():
        with open(path / "config.json") as f:
            hf = json.load(f)
        config = tr.TranceptionConfig(
            name=hf.get("model_type", "tranception"),
            num_layers=hf["n_layer"],
            embed_dim=hf["n_embd"],
            num_heads=hf["n_head"],
            n_ctx=hf.get("n_ctx", 1024),
        )
        state, _ = _load_torch_state_dict(path / "pytorch_model.bin")
        return tr.convert_torch_state_dict(state, config), config
    with open(path / "config.json") as f:
        cfg = json.load(f)
    config = tr.TranceptionConfig(**cfg)
    return restore_pytree(path / "params"), config


def load_eve_checkpoint(spec: str | Path):
    """Resolve one EVE checkpoint spec to (params, EveConfig).

    spec is either a reference torch EVE checkpoint file (the format the
    clinical reference file's EVE_model_path column points at, ref
    EVE/VAE_model.py:356-364) or an orbax directory written by
    ``pgym convert --family eve`` / native training (config.json sidecar).
    """
    import json

    from proteingym_tpu.models import eve as eve_mod

    path = Path(spec)
    if path.is_file():
        return eve_mod.load_torch_checkpoint(path)
    params = restore_pytree(path / "params" if (path / "params").exists() else path)
    sidecar = path / "config.json"
    if sidecar.exists():
        raw = json.loads(sidecar.read_text())
        fields = {f.name for f in __import__("dataclasses").fields(eve_mod.EveConfig)}
        cfg = eve_mod.EveConfig(**{
            k: (tuple(v) if isinstance(v, list) else v)
            for k, v in raw.items() if k in fields
        })
        return params, cfg
    return params, None


def load_gpt2_checkpoint(spec: str | Path, default_config=None):
    """Resolve a ProtGPT2/GPT-2 checkpoint spec to (params, Gpt2Config).

    spec: an HF model dir (config.json + pytorch_model.bin), a bare torch
    state_dict file, or an orbax dir written by ``pgym convert``.
    """
    import json

    import jax.numpy as jnp

    from proteingym_tpu.models import ar_zoo

    path = Path(spec)
    config = default_config or ar_zoo.Gpt2Config()
    if path.is_dir() and (path / "params").exists():
        sidecar = path / "config.json"
        if sidecar.exists():
            raw = json.loads(sidecar.read_text())
            fields = {
                f.name for f in __import__("dataclasses").fields(ar_zoo.Gpt2Config)
            }
            config = ar_zoo.Gpt2Config(
                **{k: v for k, v in raw.items() if k in fields and k != "dtype"}
            )
        return restore_pytree(path / "params"), config
    if path.is_dir():  # HF layout
        hf_cfg = json.loads((path / "config.json").read_text())
        config = ar_zoo.Gpt2Config(
            name=path.name,
            num_layers=int(hf_cfg["n_layer"]),
            embed_dim=int(hf_cfg["n_embd"]),
            num_heads=int(hf_cfg["n_head"]),
            vocab_size=int(hf_cfg["vocab_size"]),
            n_ctx=int(hf_cfg.get("n_positions", hf_cfg.get("n_ctx", 1024))),
        )
        weights = next(
            p for p in (path / "pytorch_model.bin", path / "model.safetensors")
            if p.exists()
        )
        state, _ = _load_torch_state_dict(weights)
        return ar_zoo.gpt2_convert_torch_state_dict(state, config), config
    state, _ = _load_torch_state_dict(path)
    return ar_zoo.gpt2_convert_torch_state_dict(state, config), config
