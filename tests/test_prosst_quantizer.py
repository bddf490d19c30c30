"""ProSST structure-token pipeline parity vs the vendored quantizer
(ref prosst/prosst/structure/quantizer.py, encoder/gvp.py) — VERDICT r2
item 4. Trained AE.pt / joblib centroids are not shipped, so parity is
graph-, subgraph-, encoder-, and pipeline-level at matched weights."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from proteingym_tpu.data.structures import synthetic_helix_backbone
from proteingym_tpu.models import prosst_quantizer as pq

AA3 = ["ALA", "CYS", "ASP", "GLU", "PHE", "GLY", "HIS", "ILE", "LYS",
       "LEU", "MET", "ASN", "PRO", "GLN", "ARG", "SER", "THR", "VAL",
       "TRP", "TYR"]


def _coords_and_pdb(tmp_path, L=14, seed=0):
    """Backbone coords round-tripped through PDB text so both pipelines
    see bit-identical float32 values."""
    raw = synthetic_helix_backbone(L, seed=seed)
    lines = []
    serial = 1
    vals = np.zeros_like(raw, dtype=np.float32)
    rs = np.random.RandomState(seed)
    names = [AA3[i] for i in rs.randint(0, 20, L)]
    for i in range(L):
        for j, atom in enumerate(["N", "CA", "C", "O"]):
            x, y, z = (f"{raw[i, j, 0]:8.3f}", f"{raw[i, j, 1]:8.3f}",
                       f"{raw[i, j, 2]:8.3f}")
            vals[i, j] = [np.float32(x), np.float32(y), np.float32(z)]
            lines.append(
                f"ATOM  {serial:5d} {atom:<4s} {names[i]} A{i + 1:4d}"
                f"    {x}{y}{z}  1.00  0.00           {atom[0]}"
            )
            serial += 1
    path = tmp_path / "toy.pdb"
    path.write_text("\n".join(lines) + "\n")
    return vals, str(path)


@pytest.fixture(scope="module")
def ref_quantizer():
    from reference_torch import load_ref_prosst_quantizer

    return load_ref_prosst_quantizer()


TINY = pq.AutoGraphEncoderConfig(
    node_in=(20, 3), node_h=(24, 4), edge_in=(32, 1), edge_h=(16, 1),
    num_layers=2,
)


def _ref_encoder(ref_quantizer, cfg=TINY, seed=0):
    torch.manual_seed(seed)
    enc = ref_quantizer.AutoGraphEncoder(
        node_in_dim=cfg.node_in, node_h_dim=cfg.node_h,
        edge_in_dim=cfg.edge_in, edge_h_dim=cfg.edge_h,
        num_layers=cfg.num_layers,
    ).eval()
    return enc


class TestGraphParity:
    def test_generate_graph_features_match(self, ref_quantizer, tmp_path):
        coords, pdb = _coords_and_pdb(tmp_path)
        ref = ref_quantizer.generate_graph(pdb, max_distance=10)
        ours = pq.graph_features(coords, max_distance=10.0)
        np.testing.assert_array_equal(
            np.asarray(ref.edge_index), ours.edge_index
        )
        np.testing.assert_allclose(
            ref.node_v.numpy(), ours.node_v, atol=1e-5
        )
        np.testing.assert_allclose(
            ref.edge_s.numpy(), ours.edge_s, atol=1e-5
        )
        np.testing.assert_allclose(
            ref.edge_v.numpy(), ours.edge_v, atol=1e-5
        )
        np.testing.assert_array_equal(ref.node_s.numpy(), ours.node_s)

    def test_subgraph_selection_matches(self, ref_quantizer, tmp_path):
        coords, pdb = _coords_and_pdb(tmp_path, L=18, seed=1)
        ref_graph = ref_quantizer.generate_graph(pdb, max_distance=10)
        ours = pq.graph_features(coords, max_distance=10.0)
        subs = ref_quantizer.generate_pos_subgraph(
            ref_graph, None, 1, 10, pure_subgraph=True
        )
        for anchor in [0, 5, 17]:
            ref_sub = subs[anchor]
            got = pq.build_subgraph(ours, anchor)
            np.testing.assert_array_equal(
                np.asarray(ref_sub.edge_index), got["edge_index"]
            )
            np.testing.assert_allclose(
                ref_sub.node_v.numpy(),
                ours.node_v[got["nodes"]], atol=1e-6,
            )
            np.testing.assert_allclose(
                ref_sub.edge_s.numpy(),
                ours.edge_s[got["edge_feat_rows"]], atol=1e-6,
            )
            np.testing.assert_allclose(
                ref_sub.edge_v.numpy(),
                ours.edge_v[got["edge_feat_rows"]], atol=1e-6,
            )


class TestEncoderParity:
    def test_get_embedding_matches(self, ref_quantizer, tmp_path):
        coords, pdb = _coords_and_pdb(tmp_path, L=16, seed=2)
        graph = pq.graph_features(coords)
        enc = _ref_encoder(ref_quantizer)
        params = pq.convert_torch_state_dict(enc.state_dict(), TINY)

        sub = pq.build_subgraph(graph, 4)
        node_s = graph.node_s[sub["nodes"]]
        # non-zero scalars exercise the scalar path too
        rs = np.random.RandomState(3)
        node_s = rs.randn(*node_s.shape).astype(np.float32)
        node_v = graph.node_v[sub["nodes"]]
        edge_s = graph.edge_s[sub["edge_feat_rows"]]
        edge_v = graph.edge_v[sub["edge_feat_rows"]]
        ei = torch.tensor(sub["edge_index"], dtype=torch.long)
        with torch.no_grad():
            want = enc.get_embedding(
                (torch.tensor(node_s), torch.tensor(node_v)),
                ei,
                (torch.tensor(edge_s), torch.tensor(edge_v)),
            ).numpy()
        got = np.asarray(pq.encoder_apply(
            params, TINY, node_s, node_v, edge_s, edge_v,
            sub["edge_index"][0], sub["edge_index"][1],
        ))
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestPipelineParity:
    def test_tokens_match_reference_pipeline(self, ref_quantizer, tmp_path):
        """Full pipeline: subgraphs -> encoder -> mean-pool -> L2 norm ->
        nearest centroid, ours (one fused union-graph program) vs the
        vendored per-subgraph torch path (predict_sturcture semantics,
        ref quantizer.py:333-360)."""
        import torch.nn.functional as F

        coords, pdb = _coords_and_pdb(tmp_path, L=20, seed=4)
        graph = pq.graph_features(coords)
        enc = _ref_encoder(ref_quantizer, seed=5)
        params = pq.convert_torch_state_dict(enc.state_dict(), TINY)
        rs = np.random.RandomState(6)
        centroids = rs.randn(8, TINY.node_h[0]).astype(np.float32)
        centroids /= np.linalg.norm(centroids, axis=-1, keepdims=True)

        # vendored-semantics reference: per-anchor subgraph loop
        want = []
        for anchor in range(coords.shape[0]):
            sub = pq.build_subgraph(graph, anchor)
            with torch.no_grad():
                emb = enc.get_embedding(
                    (torch.tensor(graph.node_s[sub["nodes"]]),
                     torch.tensor(graph.node_v[sub["nodes"]])),
                    torch.tensor(sub["edge_index"], dtype=torch.long),
                    (torch.tensor(graph.edge_s[sub["edge_feat_rows"]]),
                     torch.tensor(graph.edge_v[sub["edge_feat_rows"]])),
                )
            g = emb.mean(dim=0, keepdim=True)
            g = F.normalize(g, p=2, dim=1).numpy()
            want.append(
                int(np.argmin(((g - centroids) ** 2).sum(-1)))
            )

        got = pq.structure_tokens_from_coords(coords, params, TINY,
                                              centroids)
        np.testing.assert_array_equal(got, np.asarray(want))


class TestConvertedQuantizerScoring:
    def test_cli_convert_and_prosst_scoring(self, ref_quantizer, tmp_path):
        """pgym convert --family prosst_quantizer + prosst scorer with
        --extra quantizer_dir= produces finite scores from tokens made by
        the converted encoder."""
        import json
        import pandas as pd

        from proteingym_tpu.pipeline.cli import main

        enc = _ref_encoder(ref_quantizer, seed=7)
        torch.save(enc.state_dict(), tmp_path / "AE.pt")
        out = tmp_path / "quant"
        rc = main(["convert", "--family", "prosst_quantizer",
                   "--preset", "default",
                   "--checkpoint", str(tmp_path / "AE.pt"),
                   "--output", str(out)])
        assert rc == 0
        # config dims are inferred from the state_dict and recorded
        meta = json.loads((out / "config.json").read_text())
        assert meta["num_layers"] == 2 and meta["node_h"] == [24, 4]
        rs = np.random.RandomState(8)
        centroids = rs.randn(8, TINY.node_h[0]).astype(np.float32)
        np.save(out / "centroids.npy", centroids)

        L = 15
        AA = "ACDEFGHIKLMNPQRSTVWY"
        wt = "".join(AA[i] for i in rs.randint(0, 20, L))
        muts = [f"{wt[p]}{p + 1}{'A' if wt[p] != 'A' else 'C'}"
                for p in range(L)]
        from proteingym_tpu.data.reference import AssayRecord
        from proteingym_tpu.data.structures import synthetic_helix_backbone
        from proteingym_tpu.pipeline.scorers import ScoreContext
        from proteingym_tpu.pipeline.scorers_extra import score_prosst

        # write a PDB the scorer's _load_structure can read
        coords = synthetic_helix_backbone(L)
        pdb_dir = tmp_path / "pdb"
        pdb_dir.mkdir()
        aa3 = dict(zip(AA, AA3))
        lines = []
        serial = 1
        for i in range(L):
            for j, atom in enumerate(["N", "CA", "C", "O"]):
                x, y, z = coords[i, j]
                lines.append(
                    f"ATOM  {serial:5d} {atom:<4s} {aa3[wt[i]]} A{i + 1:4d}"
                    f"    {x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           "
                    f"{atom[0]}"
                )
                serial += 1
        (pdb_dir / "UPQ.pdb").write_text("\n".join(lines) + "\n")

        record = AssayRecord(DMS_id="Q", DMS_filename="Q.csv",
                             UniProt_ID="UPQ", target_seq=wt, seq_len=L)
        ctx = ScoreContext(
            record=record, dms_frame=pd.DataFrame({"mutant": muts}),
            structure_dir=pdb_dir,
            extra={"quantizer_dir": str(out)},
        )
        df = score_prosst(ctx)
        col = [c for c in df.columns if c.endswith("_score")][0]
        assert np.isfinite(df[col]).all()


class TestRealPdbParity:
    """Parity on the reference's shipped real structure
    (prosst/example_data/p1.pdb, 72 residues of AF-like geometry with
    genuine long-range contacts)."""

    PDB = "/root/reference/proteingym/baselines/prosst/example_data/p1.pdb"

    @pytest.fixture(scope="class")
    def real(self, ref_quantizer):
        import os

        if not os.path.exists(self.PDB):
            pytest.skip("reference example PDB not available")
        from proteingym_tpu.data.structures import parse_pdb_backbone

        coords, seq = parse_pdb_backbone(self.PDB)
        ref_graph = ref_quantizer.generate_graph(self.PDB, max_distance=10)
        ours = pq.graph_features(coords.astype(np.float32))
        return ref_graph, ours, coords

    def test_graph_matches(self, real):
        ref_graph, ours, _ = real
        np.testing.assert_array_equal(
            np.asarray(ref_graph.edge_index), ours.edge_index
        )
        np.testing.assert_allclose(
            ref_graph.node_v.numpy(), ours.node_v, atol=1e-4
        )
        np.testing.assert_allclose(
            ref_graph.edge_s.numpy(), ours.edge_s, atol=1e-4
        )

    def test_tokens_match_on_real_structure(self, ref_quantizer, real):
        import torch.nn.functional as F

        _, graph, coords = real
        enc = _ref_encoder(ref_quantizer, seed=9)
        params = pq.convert_torch_state_dict(enc.state_dict(), TINY)
        rs = np.random.RandomState(10)
        centroids = rs.randn(16, TINY.node_h[0]).astype(np.float32)
        want = []
        for anchor in range(coords.shape[0]):
            sub = pq.build_subgraph(graph, anchor)
            with torch.no_grad():
                emb = enc.get_embedding(
                    (torch.tensor(graph.node_s[sub["nodes"]]),
                     torch.tensor(graph.node_v[sub["nodes"]])),
                    torch.tensor(sub["edge_index"], dtype=torch.long),
                    (torch.tensor(graph.edge_s[sub["edge_feat_rows"]]),
                     torch.tensor(graph.edge_v[sub["edge_feat_rows"]])),
                )
            g = F.normalize(emb.mean(dim=0, keepdim=True), p=2, dim=1).numpy()
            want.append(int(np.argmin(((g - centroids) ** 2).sum(-1))))
        got = pq.predict_tokens(params, TINY, graph, centroids)
        np.testing.assert_array_equal(got, np.asarray(want))
