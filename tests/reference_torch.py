"""Import helpers for the reference's vendored PyTorch models.

Parity tests (SURVEY.md §4: "per-model log-prob parity vs tiny reference
checkpoints on CPU") instantiate the reference's own vendored modules at
tiny config, convert their real ``state_dict()`` with our converters, and
assert logit/score agreement. These helpers deal with the import-time
impedance (path layout, moved transformers symbols, missing optional deps)
WITHOUT modifying anything under /root/reference.
"""

import sys
import types
from pathlib import Path

import pytest

REF = Path("/root/reference/proteingym/baselines")

requires_reference = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not available"
)


def _ensure_path(p: Path):
    s = str(p)
    if s not in sys.path:
        sys.path.insert(0, s)


def load_ref_esm():
    """Import the vendored fair-esm package (ref esm/esm/__init__.py).

    esm/pretrained.py does ``from baselines.esm import esm``; satisfy it
    with a lazy alias module so we don't need the reference's package
    layout on sys.path.
    """
    if "esm" in sys.modules and hasattr(sys.modules["esm"], "ESM2"):
        return sys.modules["esm"]
    _ensure_path(REF / "esm")
    if "baselines" not in sys.modules:
        ba = types.ModuleType("baselines")
        bae = types.ModuleType("baselines.esm")

        def _getattr(name):
            if name == "esm":
                return sys.modules["esm"]
            raise AttributeError(name)

        bae.__getattr__ = _getattr
        ba.esm = bae
        sys.modules["baselines"] = ba
        sys.modules["baselines.esm"] = bae
    import esm  # noqa: F401

    return esm


def _shim_transformers():
    """Re-export symbols tranception imports from their pre-4.30 homes."""
    import transformers.modeling_utils as MU
    import transformers.pytorch_utils as PU

    for name in ("Conv1D", "find_pruneable_heads_and_indices", "prune_conv1d_layer"):
        if not hasattr(MU, name):
            setattr(MU, name, getattr(PU, name))
    if not hasattr(MU, "SequenceSummary"):
        import torch.nn as nn

        class SequenceSummary(nn.Module):  # only the classification head uses it
            def __init__(self, config):
                super().__init__()

            def forward(self, *a, **k):
                raise NotImplementedError("SequenceSummary stub (removed in transformers>=4.57)")

        MU.SequenceSummary = SequenceSummary


def _stub_bio():
    """biopython isn't installed; tranception only uses it to shell out to
    Clustal Omega for indel retrieval, which parity tests never touch.
    COMPOSES with the other Bio stubs (merges into an existing module)."""
    if "Bio.Align" in sys.modules:
        return
    bio = sys.modules.get("Bio") or types.ModuleType("Bio")
    align = types.ModuleType("Bio.Align")
    apps = types.ModuleType("Bio.Align.Applications")
    seqio = types.ModuleType("Bio.SeqIO")

    class ClustalOmegaCommandline:
        def __init__(self, *a, **k):
            raise NotImplementedError("Bio stub")

    apps.ClustalOmegaCommandline = ClustalOmegaCommandline
    seqio.parse = lambda *a, **k: iter(())
    align.Applications = apps
    bio.Align = align
    bio.SeqIO = seqio
    sys.modules["Bio"] = bio
    sys.modules["Bio.Align"] = align
    sys.modules["Bio.Align.Applications"] = apps
    sys.modules["Bio.SeqIO"] = seqio


def load_ref_tranception():
    _shim_transformers()
    _stub_bio()
    _ensure_path(REF / "tranception")
    import tranception  # noqa: F401
    import tranception.model_pytorch

    return tranception


def load_ref_trancepteve():
    _shim_transformers()
    _stub_numba()
    _ensure_path(REF / "trancepteve")
    import trancepteve  # noqa: F401
    import trancepteve.model_pytorch

    return trancepteve


def load_ref_poet():
    _ensure_path(REF / "PoET")
    import poet.models.poet

    return sys.modules["poet"]


def load_ref_progen2():
    _ensure_path(REF / "progen2")
    import models.progen.modeling_progen as m

    return m


def load_ref_mpnn():
    _ensure_path(REF / "protein_mpnn")
    import protein_mpnn_utils as m

    return m


def load_ref_rita():
    """rita_modeling.py uses package-relative imports but ships without an
    __init__.py; mount it as a synthetic package."""
    if "refrita.rita_modeling" in sys.modules:
        return sys.modules["refrita.rita_modeling"]
    import importlib

    pkg = types.ModuleType("refrita")
    pkg.__path__ = [str(REF / "rita")]
    sys.modules["refrita"] = pkg
    return importlib.import_module("refrita.rita_modeling")


def _stub_numba():
    """The reference EVE pulls in numba only for the weights kernel; stub it
    (we never call that code path in parity tests)."""
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def _passthrough(*args, **kwargs):
            if len(args) == 1 and callable(args[0]) and not kwargs:
                return args[0]
            return lambda f: f

        numba.jit = _passthrough
        numba.njit = _passthrough
        numba.prange = range
        sys.modules["numba"] = numba
    if "numba_progress" not in sys.modules:
        np_mod = types.ModuleType("numba_progress")

        class ProgressBar:
            def __init__(self, *a, **k):
                pass

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

            def update(self, *a):
                pass

        np_mod.ProgressBar = ProgressBar
        sys.modules["numba_progress"] = np_mod


def _stub_megablocks_and_flash():
    """ProGen3's vendored modeling imports megablocks + flash_attn at module
    scope but never touches them on the 'eager' MoE path; stub them with the
    minimal surface (a pure-torch rms_norm_fn, placeholder dMoE/Arguments)."""
    if "megablocks" not in sys.modules:
        import torch

        mb = types.ModuleType("megablocks")
        layers = types.ModuleType("megablocks.layers")
        moe = types.ModuleType("megablocks.layers.moe")
        moe.clear_load_balancing_loss = lambda: None
        moe.batched_load_balancing_loss = lambda args: torch.zeros(())
        arguments = types.ModuleType("megablocks.layers.arguments")

        class Arguments:
            def __init__(self, **kwargs):
                self.__dict__.update(kwargs)

        arguments.Arguments = Arguments
        common = types.ModuleType("megablocks.layers.common")
        dmoe = types.ModuleType("megablocks.layers.dmoe")

        class dMoE:  # only used for isinstance checks on the eager path
            def __init__(self, *a, **k):
                raise NotImplementedError("megablocks stub")

        dmoe.dMoE = dMoE
        layers.moe = moe
        layers.arguments = arguments
        layers.common = common
        layers.dmoe = dmoe
        mb.layers = layers
        for name, mod in (
            ("megablocks", mb),
            ("megablocks.layers", layers),
            ("megablocks.layers.moe", moe),
            ("megablocks.layers.arguments", arguments),
            ("megablocks.layers.common", common),
            ("megablocks.layers.dmoe", dmoe),
        ):
            sys.modules[name] = mod
    if "flash_attn" not in sys.modules:
        import torch

        fa = types.ModuleType("flash_attn")
        ops = types.ModuleType("flash_attn.ops")
        triton = types.ModuleType("flash_attn.ops.triton")
        ln_mod = types.ModuleType("flash_attn.ops.triton.layer_norm")

        def rms_norm_fn(x, weight, bias, residual=None, eps=1e-6,
                        dropout_p=0.0, prenorm=False, residual_in_fp32=False):
            x32 = x.float()
            out = x32 * torch.rsqrt(x32.pow(2).mean(-1, keepdim=True) + eps)
            out = out * weight.float()
            if bias is not None:
                out = out + bias.float()
            return out.to(x.dtype)

        ln_mod.rms_norm_fn = rms_norm_fn
        triton.layer_norm = ln_mod
        ops.triton = triton
        fa.ops = ops
        import importlib.machinery

        for name, mod in (
            ("flash_attn", fa),
            ("flash_attn.ops", ops),
            ("flash_attn.ops.triton", triton),
            ("flash_attn.ops.triton.layer_norm", ln_mod),
        ):
            # transformers probes importlib.util.find_spec("flash_attn"),
            # which raises if a registered module has __spec__ = None
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod


def load_ref_progen3():
    _stub_megablocks_and_flash()
    # GenerationMixin moved out of modeling_utils in transformers>=4.50
    import transformers.modeling_utils as MU

    if not hasattr(MU, "GenerationMixin"):
        from transformers.generation.utils import GenerationMixin

        MU.GenerationMixin = GenerationMixin
    _ensure_path(REF / "progen3")
    import progen3.modeling as m

    return m


def load_ref_eve():
    _stub_numba()
    _ensure_path(REF / "EVE")
    from EVE import VAE_model

    return VAE_model


def _stub_torch_geometric():
    """Minimal torch_geometric surface for the vendored GVPConv
    (ref esm/esm/inverse_folding/gvp_modules.py:267-328) and ProtSSN's
    EGNN_Sparse, whose OVERRIDDEN propagate calls the MessagePassing
    internals _check_input/_collect/inspector/aggregate/update
    (ref protssn/src/module/egnn/egnn_pytorch_geometric.py:245-299)."""
    if "torch_geometric" in sys.modules:
        return
    import inspect

    import torch
    import torch.nn as nn

    class _Inspector:
        def __init__(self, module):
            self.module = module

        def distribute(self, name, coll):
            params = inspect.signature(
                getattr(self.module, name)
            ).parameters
            return {p: coll[p] for p in params if p in coll}

    class MessagePassing(nn.Module):
        def __init__(self, aggr="mean", **kwargs):
            super().__init__()
            self.aggr = aggr
            self.inspector = _Inspector(self)
            self._user_args = []

        def _check_input(self, edge_index, size):
            return size

        def _collect(self, user_args, edge_index, size, kwargs):
            src, dst = edge_index[0], edge_index[1]
            coll = dict(kwargs)
            num_nodes = None
            for k, v in list(kwargs.items()):
                if torch.is_tensor(v) and k not in ("edge_attr",):
                    coll[f"{k}_i"] = v[dst]
                    coll[f"{k}_j"] = v[src]
                    if k in ("s", "x"):
                        num_nodes = v.shape[0]
            coll["index"] = dst
            coll["dim_size"] = num_nodes
            return coll

        def aggregate(self, inputs, index, dim_size=None):
            agg = torch.zeros(
                dim_size, inputs.shape[-1], dtype=inputs.dtype,
                device=inputs.device,
            )
            agg.index_add_(0, index, inputs)
            if self.aggr == "mean":
                count = torch.zeros(dim_size, dtype=inputs.dtype)
                count.index_add_(
                    0, index, torch.ones_like(index, dtype=inputs.dtype)
                )
                agg = agg / count.clamp(min=1).unsqueeze(-1)
            return agg

        def update(self, inputs, **kwargs):
            return inputs

        def propagate(self, edge_index, size=None, **kwargs):
            coll = self._collect(self._user_args, edge_index, size, kwargs)
            out = self.message(**self.inspector.distribute("message", coll))
            return self.aggregate(
                out, coll["index"], dim_size=coll["dim_size"]
            )

    class Data:
        def __init__(self, **kwargs):
            self.__dict__.update(kwargs)

        def clone(self):
            import copy

            return copy.copy(self)

    class _AnyInit:
        def __init__(self, *a, **k):
            pass

    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_nn.MessagePassing = MessagePassing
    tg_nn_norm = types.ModuleType("torch_geometric.nn.norm")
    tg_nn_norm.LayerNorm = _AnyInit
    tg_nn.norm = tg_nn_norm
    tg_typing = types.ModuleType("torch_geometric.typing")
    tg_typing.Adj = object
    tg_typing.Size = object
    tg_typing.OptTensor = object
    tg_typing.Tensor = torch.Tensor
    tg_data = types.ModuleType("torch_geometric.data")
    tg_data.Data = Data
    tg_data.Dataset = _AnyInit
    tg_data.InMemoryDataset = _AnyInit
    tg_transforms = types.ModuleType("torch_geometric.transforms")

    class BaseTransform:
        pass

    tg_transforms.BaseTransform = BaseTransform
    tg.nn = tg_nn
    tg.typing = tg_typing
    tg.data = tg_data
    tg.transforms = tg_transforms
    for name, mod in (
        ("torch_geometric", tg),
        ("torch_geometric.nn", tg_nn),
        ("torch_geometric.nn.norm", tg_nn_norm),
        ("torch_geometric.typing", tg_typing),
        ("torch_geometric.data", tg_data),
        ("torch_geometric.transforms", tg_transforms),
    ):
        sys.modules[name] = mod


def _stub_biotite():
    """biotite is only used for PDB IO in inverse_folding/util.py; parity
    tests feed coordinates directly."""
    if "biotite" in sys.modules:
        return
    bs = types.ModuleType("biotite.structure")
    bs.filter_backbone = lambda *a, **k: None
    bs.get_chains = lambda *a, **k: []
    bs.apply_residue_wise = lambda *a, **k: None

    class _AtomArray:
        pass

    bs.AtomArray = _AtomArray
    bio = types.ModuleType("biotite")
    bio.structure = bs
    bsio = types.ModuleType("biotite.structure.io")
    bsio.pdbx = types.ModuleType("biotite.structure.io.pdbx")
    bsio.pdb = types.ModuleType("biotite.structure.io.pdb")
    bsr = types.ModuleType("biotite.structure.residues")
    bsr.get_residues = lambda *a, **k: None
    bseq = types.ModuleType("biotite.sequence")

    class ProteinSequence:
        @staticmethod
        def convert_letter_3to1(r):
            raise NotImplementedError("biotite stub")

    bseq.ProteinSequence = ProteinSequence
    bs.io = bsio
    bs.residues = bsr
    for name, mod in (
        ("biotite", bio),
        ("biotite.structure", bs),
        ("biotite.structure.io", bsio),
        ("biotite.structure.io.pdbx", bsio.pdbx),
        ("biotite.structure.io.pdb", bsio.pdb),
        ("biotite.structure.residues", bsr),
        ("biotite.sequence", bseq),
    ):
        sys.modules[name] = mod


def load_ref_if1():
    """Import the vendored GVP-Transformer (ESM-IF1) model."""
    load_ref_esm()
    _stub_torch_geometric()
    _stub_biotite()
    import esm.inverse_folding.gvp_transformer as m

    return m


def _stub_bio_pdb_rdkit():
    """Bio.PDB / rdkit are only used for PDB parsing + SASA in ProtSSN's
    dataset; parity tests drive the graph builder with coordinates.

    COMPOSES with _stub_bio_pdb (the ProSST quantizer's functional ATOM
    parser): only fills in attributes that are missing, so test ordering
    cannot break either consumer."""
    bio = sys.modules.get("Bio") or types.ModuleType("Bio")
    pdb = sys.modules.get("Bio.PDB") or types.ModuleType("Bio.PDB")

    class _AnyInit:
        def __init__(self, *a, **k):
            pass

    if not hasattr(pdb, "PDBParser"):
        pdb.PDBParser = _AnyInit
    if not hasattr(pdb, "ShrakeRupley"):
        pdb.ShrakeRupley = _AnyInit
    if not hasattr(pdb, "PDBExceptions"):
        exc = types.ModuleType("Bio.PDB.PDBExceptions")

        class PDBConstructionWarning(Warning):
            pass

        exc.PDBConstructionWarning = PDBConstructionWarning
        pdb.PDBExceptions = exc
        sys.modules["Bio.PDB.PDBExceptions"] = exc
    bio.PDB = pdb
    sys.modules["Bio"] = bio
    sys.modules["Bio.PDB"] = pdb
    if "rdkit" not in sys.modules:
        rdkit = types.ModuleType("rdkit")
        chem = types.ModuleType("rdkit.Chem")
        chem.GetPeriodicTable = lambda: None
        rdkit.Chem = chem
        sys.modules["rdkit"] = rdkit
        sys.modules["rdkit.Chem"] = chem


def load_ref_protssn():
    """Import ProtSSN's vendored EGNN + dataset modules ('src' package has
    no __init__.py; mount synthetic packages)."""
    _stub_torch_geometric()
    _stub_bio_pdb_rdkit()
    base = REF / "protssn"
    if "src" not in sys.modules:
        for name, path in (
            ("src", base / "src"),
            ("src.module", base / "src" / "module"),
            ("src.utils", base / "src" / "utils"),
            ("src.dataset", base / "src" / "dataset"),
        ):
            pkg = types.ModuleType(name)
            pkg.__path__ = [str(path)]
            sys.modules[name] = pkg
    import importlib

    network = importlib.import_module("src.module.egnn.network")
    dataset = importlib.import_module("src.dataset.mutant_dataset")
    utils = importlib.import_module("src.utils.dataset_utils")
    return network, dataset, utils


_EVOSCALE_CACHE: dict = {}


def load_ref_esm3():
    """Import the vendored evoscale SDK (ESM3 + structure VQ-VAE).

    The SDK claims the 'esm' package name, clashing with the fair-esm
    vendored under baselines/esm — swap sys.modules around the import and
    keep the evoscale modules cached off to the side."""
    if _EVOSCALE_CACHE:
        return _EVOSCALE_CACHE["esm3"], _EVOSCALE_CACHE["vqvae"]
    # load the real huggingface_hub entry points BEFORE the brotli stub goes
    # in (urllib3 sniffs for brotli and would trip over the fake module)
    from huggingface_hub import snapshot_download  # noqa: F401
    if "zstd" not in sys.modules:
        zstd = types.ModuleType("zstd")
        zstd.ZSTD_uncompress = lambda b: b
        sys.modules["zstd"] = zstd
    if "cloudpathlib" not in sys.modules:
        cp = types.ModuleType("cloudpathlib")

        class CloudPath:  # only used in type annotations
            pass

        cp.CloudPath = CloudPath
        cp.AnyPath = CloudPath
        cp.S3Path = CloudPath
        cp.GSPath = CloudPath
        sys.modules["cloudpathlib"] = cp
    if "msgpack" not in sys.modules:
        mp = types.ModuleType("msgpack")
        mp.unpackb = lambda *a, **k: None
        mp.packb = lambda *a, **k: b""
        sys.modules["msgpack"] = mp
    if "msgpack_numpy" not in sys.modules:
        mpn = types.ModuleType("msgpack_numpy")
        mpn.patch = lambda: None
        sys.modules["msgpack_numpy"] = mpn
    if "brotli" not in sys.modules:
        br = types.ModuleType("brotli")
        br.compress = lambda b, **k: b
        br.decompress = lambda b: b
        sys.modules["brotli"] = br
    _stub_biotite()
    bs_mod = sys.modules["biotite.structure"]
    for name in ("annotate_sse", "filter_amino_acids", "get_chains"):
        if not hasattr(bs_mod, name):
            setattr(bs_mod, name, lambda *a, **k: None)

    class _AnyInit2:
        def __init__(self, *a, **k):
            pass

    if not hasattr(bs_mod, "Atom"):
        bs_mod.Atom = _AnyInit2
        bs_mod.AtomArray = getattr(bs_mod, "AtomArray", _AnyInit2)
        bs_mod.AtomArrayStack = _AnyInit2
        bs_mod.array = lambda *a, **k: None
    if "biotite.application" not in sys.modules:
        app = types.ModuleType("biotite.application")
        dssp = types.ModuleType("biotite.application.dssp")
        dssp.DsspApp = _AnyInit2
        app.dssp = dssp
        sys.modules["biotite.application"] = app
        sys.modules["biotite.application.dssp"] = dssp
    if "biotite.database" not in sys.modules:
        db = types.ModuleType("biotite.database")
        rcsb = types.ModuleType("biotite.database.rcsb")
        rcsb.fetch = lambda *a, **k: None
        db.rcsb = rcsb
        sys.modules["biotite.database"] = db
        sys.modules["biotite.database.rcsb"] = rcsb
    pdbmod = sys.modules.get("biotite.structure.io.pdb")
    if pdbmod is not None and not hasattr(pdbmod, "PDBFile"):
        pdbmod.PDBFile = _AnyInit2
    cifmod = sys.modules.get("biotite.structure.io.pdbx")
    if cifmod is not None and not hasattr(cifmod, "CIFFile"):
        cifmod.CIFFile = _AnyInit2
        cifmod.get_structure = lambda *a, **k: None
    bio = sys.modules.get("Bio") or types.ModuleType("Bio")
    if "Bio.Data" not in sys.modules:
        bdata = types.ModuleType("Bio.Data")
        pdbdata = types.ModuleType("Bio.Data.PDBData")
        pdbdata.protein_letters_3to1 = {}
        pdbdata.protein_letters_1to3 = {}
        pdbdata.protein_letters_3to1_extended = {}
        bdata.PDBData = pdbdata
        bio.Data = bdata
        sys.modules["Bio"] = bio
        sys.modules["Bio.Data"] = bdata
        sys.modules["Bio.Data.PDBData"] = pdbdata
    saved = {
        k: v for k, v in sys.modules.items()
        if k == "esm" or k.startswith("esm.")
    }
    for k in saved:
        del sys.modules[k]
    p = str(REF / "evoscale")
    fair = str(REF / "esm")
    had_fair = fair in sys.path
    if had_fair:
        sys.path.remove(fair)
    sys.path.insert(0, p)
    try:
        import esm.models.esm3 as m3
        import esm.models.vqvae as mv

        evo = {
            k: v for k, v in sys.modules.items()
            if k == "esm" or k.startswith("esm.")
        }
    finally:
        for k in list(sys.modules):
            if k == "esm" or k.startswith("esm."):
                del sys.modules[k]
        sys.modules.update(saved)
        sys.path.remove(p)
        if had_fair:
            sys.path.insert(0, fair)
    _EVOSCALE_CACHE.update(esm3=m3, vqvae=mv, modules=evo)
    return m3, mv


def evoscale_module(name: str):
    """Fetch a cached evoscale submodule (e.g. 'esm.tokenization')."""
    load_ref_esm3()
    return _EVOSCALE_CACHE["modules"][name]


def load_ref_s3f():
    """Import the vendored S3F GVP networks (s3f/gvp.py) with minimal
    torchdrug / torch_cluster / torch_scatter / pykeops-surface shims."""
    if "s3f.gvp" in sys.modules:
        return sys.modules["s3f.gvp"], sys.modules["s3f.gvp_layer"]
    import torch
    import torch.nn as nn

    _stub_torch_geometric()
    if not hasattr(nn.Module, "device"):  # torchdrug patches nn.Module
        def _get_device(self):
            if "_device_override" in self.__dict__:
                return self.__dict__["_device_override"]
            return next(self.parameters()).device

        def _set_device(self, value):
            # models like the reference EVE assign self.device in __init__;
            # keep that working alongside the property
            self.__dict__["_device_override"] = value

        nn.Module.device = property(_get_device, _set_device)
    if "torch_scatter" not in sys.modules:
        ts = types.ModuleType("torch_scatter")

        def scatter_add(src, index, dim=0, dim_size=None):
            size = dim_size or int(index.max()) + 1
            shape = list(src.shape)
            shape[dim] = size
            out = torch.zeros(*shape, dtype=src.dtype, device=src.device)
            return out.index_add_(dim, index, src)

        ts.scatter_add = scatter_add
        sys.modules["torch_scatter"] = ts
    if "torch_cluster" not in sys.modules:
        tc = types.ModuleType("torch_cluster")

        def knn_graph(x, k, batch=None, loop=False):
            d = torch.cdist(x, x)
            d.fill_diagonal_(float("inf"))
            idx = d.topk(min(k, len(x) - 1), largest=False).indices
            centers = torch.arange(len(x)).repeat_interleave(idx.shape[1])
            return torch.stack([idx.flatten(), centers])

        tc.knn_graph = knn_graph
        sys.modules["torch_cluster"] = tc
    if "torchdrug" not in sys.modules:
        td = types.ModuleType("torchdrug")
        core = types.ModuleType("torchdrug.core")

        class Configurable:
            pass

        class _Registry:
            @staticmethod
            def register(name):
                return lambda cls: cls

        core.Configurable = Configurable
        core.Registry = _Registry
        layers_mod = types.ModuleType("torchdrug.layers")

        class SumReadout(nn.Module):
            def forward(self, graph, feature):
                return feature.sum(0, keepdim=True)

        class MeanReadout(nn.Module):
            def forward(self, graph, feature):
                return feature.mean(0, keepdim=True)

        layers_mod.SumReadout = SumReadout
        layers_mod.MeanReadout = MeanReadout
        td.core = core
        td.layers = layers_mod
        sys.modules["torchdrug"] = td
        sys.modules["torchdrug.core"] = core
        sys.modules["torchdrug.layers"] = layers_mod
    # mount the s3f package and pre-register a pykeops-free surface module
    if "s3f" not in sys.modules:
        pkg = types.ModuleType("s3f")
        pkg.__path__ = [str(REF / "S3F" / "s3f")]
        sys.modules["s3f"] = pkg
        surf = types.ModuleType("s3f.surface")

        def knn_atoms(x, y, k, batch_x=None, batch_y=None):
            # exact semantics of surface.knn_atoms (surface.py:43-60):
            # k+1 nearest of y per x, SQUARED distances
            k = k + 1
            d2 = torch.cdist(x, y) ** 2
            dists, idx = d2.topk(min(k, y.shape[0]), largest=False)
            return idx, dists

        surf.knn_atoms = knn_atoms
        sys.modules["s3f.surface"] = surf
    import importlib

    gvp = importlib.import_module("s3f.gvp")
    layer = importlib.import_module("s3f.gvp_layer")
    return gvp, layer


def load_ref_mulan():
    """Import the vendored MULAN package (model.py + model_utils.py only;
    the tokenizer/dataset pull biopython + deli which parity tests never
    touch)."""
    if "mulan.model" in sys.modules:
        return sys.modules["mulan.model"]
    # transformers>=4.45 dropped past_key_values_length from
    # create_position_ids_from_input_ids; re-add the old signature
    from transformers.models.esm import modeling_esm as _me

    _orig = _me.create_position_ids_from_input_ids
    try:
        import inspect as _inspect

        _nparams = len(_inspect.signature(_orig).parameters)
    except (TypeError, ValueError):
        _nparams = 2
    if _nparams < 3:
        def _compat(input_ids, padding_idx, past_key_values_length=0):
            mask = input_ids.ne(padding_idx).int()
            import torch as _t

            incremental = (_t.cumsum(mask, dim=1).type_as(mask)
                           + past_key_values_length) * mask
            return incremental.long() + padding_idx

        _me.create_position_ids_from_input_ids = _compat
    # configs built directly (not from_pretrained) carry
    # _attn_implementation=None; route that to the eager kernel
    try:
        _me.ALL_ATTENTION_FUNCTIONS[None]
    except KeyError:
        _me.ALL_ATTENTION_FUNCTIONS._local_mapping[None] = (
            _me.eager_attention_forward
        )
    # newer EsmEncoder outputs drop past_key_values; the vendored
    # StructEsmModel still reads it — default it to None
    from transformers import modeling_outputs as _mo

    if not hasattr(_mo.BaseModelOutputWithCrossAttentions,
                   "past_key_values"):
        _mo.BaseModelOutputWithCrossAttentions.past_key_values = None
    pkg = types.ModuleType("mulan")
    pkg.__path__ = [str(REF / "mulan" / "mulan")]
    sys.modules["mulan"] = pkg
    import importlib

    return importlib.import_module("mulan.model")


def load_ref_vespag():
    """Vendored VespaG models (plain torch + jaxtyping; ref
    baselines/vespag/vespag/models/). The parent ``vespag`` package pulls
    in polars (absent); mount only the models subpackage."""
    if "refvespag.models" in sys.modules:
        return sys.modules["refvespag.models"]
    import importlib

    pkg = types.ModuleType("refvespag")
    pkg.__path__ = [str(REF / "vespag" / "vespag")]
    sys.modules["refvespag"] = pkg
    return importlib.import_module("refvespag.models")


def _stub_torch_scatter():
    """torch_scatter used by the ProSST quantizer/encoder for mean/sum/max
    pooling only."""
    if "torch_scatter" in sys.modules:
        return
    import torch

    def _zeros(src, index, dim_size):
        n = int(dim_size) if dim_size is not None else int(index.max()) + 1
        return torch.zeros((n,) + src.shape[1:], dtype=src.dtype)

    def scatter_add(src, index, dim=0, dim_size=None):
        out = _zeros(src, index, dim_size)
        out.index_add_(0, index, src)
        return out

    def scatter_sum(src, index, dim=0, dim_size=None):
        return scatter_add(src, index, dim, dim_size)

    def scatter_mean(src, index, dim=0, dim_size=None):
        out = scatter_add(src, index, dim, dim_size)
        cnt = torch.zeros(out.shape[0], dtype=src.dtype)
        cnt.index_add_(0, index, torch.ones(len(index), dtype=src.dtype))
        return out / cnt.clamp(min=1).view(-1, *([1] * (src.dim() - 1)))

    def scatter_max(src, index, dim=0, dim_size=None):
        n = int(dim_size) if dim_size is not None else int(index.max()) + 1
        out = torch.full((n,) + src.shape[1:], float("-inf"),
                         dtype=src.dtype)
        arg = torch.zeros((n,) + src.shape[1:], dtype=torch.long)
        for i in range(len(index)):
            m = src[i] > out[index[i]]
            out[index[i]][m] = src[i][m]
            arg[index[i]][m] = i
        return out, arg

    ts = types.ModuleType("torch_scatter")
    ts.scatter_add = scatter_add
    ts.scatter_sum = scatter_sum
    ts.scatter_mean = scatter_mean
    ts.scatter_max = scatter_max
    sys.modules["torch_scatter"] = ts


def _stub_pathos():
    """pathos.threading.ThreadPool -> serial map (tests are tiny)."""
    if "pathos" in sys.modules:
        return

    class ThreadPool:
        def __init__(self, *a, **k):
            pass

        def imap(self, fn, data):
            return map(fn, data)

        def map(self, fn, data):
            return [fn(d) for d in data]

    pathos = types.ModuleType("pathos")
    threading = types.ModuleType("pathos.threading")
    threading.ThreadPool = ThreadPool
    pathos.threading = threading
    sys.modules["pathos"] = pathos
    sys.modules["pathos.threading"] = threading


def _stub_bio_pdb():
    """Minimal Bio.PDB parser for the fixed-format ATOM records our tests
    write, plus Bio.SeqUtils.seq1 (the quantizer's only Bio surface).

    COMPOSES with _stub_bio_pdb_rdkit: always (re)installs the functional
    PDBParser — the ProtSSN stub's parser is inert — while keeping any
    attributes another stub already added."""
    if "Bio.PDB" in sys.modules and hasattr(
        sys.modules["Bio.PDB"].PDBParser, "get_structure"
    ):
        return
    import numpy as np

    _3to1 = {
        "ALA": "A", "CYS": "C", "ASP": "D", "GLU": "E", "PHE": "F",
        "GLY": "G", "HIS": "H", "ILE": "I", "LYS": "K", "LEU": "L",
        "MET": "M", "ASN": "N", "PRO": "P", "GLN": "Q", "ARG": "R",
        "SER": "S", "THR": "T", "VAL": "V", "TRP": "W", "TYR": "Y",
    }

    class _Atom:
        def __init__(self, coord):
            self.coord = np.asarray(coord, dtype=np.float32)

        def get_coord(self):
            return self.coord

    class _Residue:
        def __init__(self, resname, num):
            self.resname = resname
            self.num = num
            self.atoms = {}

        def get_id(self):
            return (" ", self.num, " ")

        def get_resname(self):
            return self.resname

        def __getitem__(self, name):
            return self.atoms[name]

    class _Chain(list):
        pass

    class _Model(list):
        pass

    class _Structure:
        def __init__(self, models):
            self.models = models

        def __getitem__(self, i):
            return self.models[i]

        def __iter__(self):
            return iter(self.models)

    class PDBParser:
        def __init__(self, QUIET=True):
            pass

        def get_structure(self, name, path):
            residues = {}
            order = []
            for line in open(path):
                if not line.startswith("ATOM"):
                    continue
                atom = line[12:16].strip()
                resname = line[17:20].strip()
                resnum = int(line[22:26])
                x = float(line[30:38])
                y = float(line[38:46])
                z = float(line[46:54])
                if resnum not in residues:
                    residues[resnum] = _Residue(resname, resnum)
                    order.append(resnum)
                residues[resnum].atoms[atom] = _Atom([x, y, z])
            chain = _Chain(residues[i] for i in order)
            return _Structure([_Model([chain])])

    bio = sys.modules.get("Bio") or types.ModuleType("Bio")
    pdb_mod = sys.modules.get("Bio.PDB") or types.ModuleType("Bio.PDB")
    pdb_mod.PDBParser = PDBParser
    sequtils = types.ModuleType("Bio.SeqUtils")
    sequtils.seq1 = lambda r: _3to1.get(r, "X")
    bio.PDB = pdb_mod
    bio.SeqUtils = sequtils
    sys.modules["Bio"] = bio
    sys.modules["Bio.PDB"] = pdb_mod
    sys.modules["Bio.SeqUtils"] = sequtils


def load_ref_prosst_quantizer():
    """Vendored ProSST structure quantizer + AutoGraphEncoder
    (ref prosst/prosst/structure/): mounted as a synthetic package with
    torch_geometric/torch_scatter/Bio/biotite/pathos stubbed."""
    if "refprosst.structure.quantizer" in sys.modules:
        return sys.modules["refprosst.structure.quantizer"]
    _stub_torch_geometric()
    _stub_torch_scatter()
    _stub_pathos()
    _stub_bio_pdb()
    _stub_biotite()
    import importlib

    import torch_geometric.data as tgd

    if not hasattr(tgd, "Batch"):
        tgd.Batch = tgd.Data
    pkg = types.ModuleType("refprosst")
    pkg.__path__ = [str(REF / "prosst" / "prosst")]
    sys.modules["refprosst"] = pkg
    sub = types.ModuleType("refprosst.structure")
    sub.__path__ = [str(REF / "prosst" / "prosst" / "structure")]
    sys.modules["refprosst.structure"] = sub
    return importlib.import_module("refprosst.structure.quantizer")


def load_ref_kermut():
    """Vendored Kermut kernel (ref kermut/kermut/model/kernel.py) with
    gpytorch/hydra/omegaconf stubbed (VERDICT r2 item 5): gpytorch's
    Kernel base only contributes nn.Module machinery to this class."""
    if "kermut.model.kernel" in sys.modules:
        return sys.modules["kermut.model.kernel"]
    import importlib

    import torch

    if "gpytorch" not in sys.modules:
        gp = types.ModuleType("gpytorch")
        gpk = types.ModuleType("gpytorch.kernels")
        gpk.Kernel = torch.nn.Module
        gp.kernels = gpk
        sys.modules["gpytorch"] = gp
        sys.modules["gpytorch.kernels"] = gpk
    if "hydra" not in sys.modules:
        hydra = types.ModuleType("hydra")
        hydra.utils = types.ModuleType("hydra.utils")
        hydra.utils.instantiate = lambda *a, **k: None
        sys.modules["hydra"] = hydra
        sys.modules["hydra.utils"] = hydra.utils
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")

        class DictConfig(dict):
            pass

        oc.DictConfig = DictConfig
        oc.OmegaConf = types.SimpleNamespace(
            to_container=lambda *a, **k: {}
        )
        sys.modules["omegaconf"] = oc
    _ensure_path(REF / "kermut")
    return importlib.import_module("kermut.model.kernel")


def load_ref_aido_misc():
    """Import the reference AIDO recipe module (ref AIDO/utils/misc.py).

    The module imports Bio.SeqIO and modelgenerator's structure
    tokenizer at module scope; neither is installed offline and neither
    is touched by the recipe functions under test
    (get_logits_table_sliding / get_scores_from_table / greedy_select /
    tokenize), so they are satisfied with attribute stubs."""
    import importlib.util

    for name, attrs in (
        ("Bio", {"SeqIO": types.SimpleNamespace()}),
        ("modelgenerator", {}),
        ("modelgenerator.structure_tokenizer", {}),
        ("modelgenerator.structure_tokenizer.models",
         {"EquiformerEncoderLightning": object,
          "ESMFoldDecoderLightning": object}),
        ("modelgenerator.structure_tokenizer.datasets", {}),
        ("modelgenerator.structure_tokenizer.datasets.protein_dataset",
         {"ProteinDataset": object}),
    ):
        # MERGE into any existing stub rather than skipping: other
        # loaders in this file install partial "Bio" stubs (PDB-only for
        # ProtSSN/ESCOTT, Align-only for the MSA tools), and whichever
        # parity test ran first used to poison this one with a Bio that
        # lacked SeqIO (full-suite-order-only failure, r5)
        mod = sys.modules.get(name) or types.ModuleType(name)
        for k, v in attrs.items():
            if not hasattr(mod, k):
                setattr(mod, k, v)
        sys.modules[name] = mod
    spec = importlib.util.spec_from_file_location(
        "aido_ref_misc", REF / "AIDO" / "utils" / "misc.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_ref_xtrimo():
    """Import the reference xTrimoPGLM scoring module
    (ref xtrimopglm/compute_fitness.py — plain torch/transformers/scipy
    imports, all available offline)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "xtrimo_ref_cf", REF / "xtrimopglm" / "compute_fitness.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_ref_escott():
    """Import the reference ESCOTT wrapper (ref escott/compute_fitness.py).

    Its pdb_utils helper imports Bio.PDB (not installed offline, not
    touched by parse_alignment / extract_scores); stub it."""
    import importlib.util

    # merge into any existing Bio/Bio.PDB stub (ProtSSN's loader installs
    # a Bio.PDB without Select/PDBIO; skipping on presence poisoned this
    # loader under full-suite ordering, r5)
    bio = sys.modules.get("Bio") or types.ModuleType("Bio")
    pdb = sys.modules.get("Bio.PDB") or types.ModuleType("Bio.PDB")

    class _Select:  # subclassable stand-in for Bio.PDB.Select
        pass

    for k, v in (("PDBParser", object), ("PDBIO", object),
                 ("Select", _Select)):
        if not hasattr(pdb, k):
            setattr(pdb, k, v)
    bio.PDB = pdb
    sys.modules["Bio"] = bio
    sys.modules["Bio.PDB"] = pdb
    _ensure_path(REF / "escott")
    spec = importlib.util.spec_from_file_location(
        "escott_ref_cf", REF / "escott" / "compute_fitness.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
