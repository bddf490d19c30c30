"""S2F/S3F parity vs the vendored torch GVP networks (ref S3F/s3f/gvp.py,
gvp_layer.py): the drorlab GVP variant, radius-graph stream, surface
stream, the task head, and the evaluate.py scoring contract."""

import types

import numpy as np
import pytest
import torch

from tests.reference_torch import load_ref_s3f, requires_reference

torch.manual_seed(0)

L = 18
D_IN = 32


def positions(L, seed=3):
    rng = np.random.RandomState(seed)
    return np.cumsum(
        rng.randn(L, 3) * 1.0 + np.array([3.4, 0.5, 0.1]), axis=0
    ).astype(np.float32)


class _FakeGraph:
    def __init__(self, pos, src, dst):
        E = len(src)
        self.node_position = torch.tensor(pos)
        self.edge_list = torch.tensor(
            np.stack([src, dst, np.zeros_like(src)], axis=1).astype(np.int64)
        )
        self.residue2graph = torch.zeros(len(pos), dtype=torch.long)
        self.node2graph = torch.zeros(len(pos), dtype=torch.long)


class _FakeSurfGraph:
    def __init__(self, pos, feat):
        S = len(pos)
        self.node_position = torch.tensor(pos)
        self.node_feature = torch.tensor(feat)
        self.node2graph = torch.zeros(S, dtype=torch.long)
        self.num_node = S
        self.num_nodes = torch.tensor([S])
        self.num_cum_nodes = torch.tensor([S])


@requires_reference
class TestS2fParity:
    @pytest.fixture(scope="class")
    def pair(self):
        gvp_mod, _ = load_ref_s3f()
        from proteingym_tpu.models import s3f as ours

        c = ours.S3F_PRESETS["s2f_tiny"]
        ref = gvp_mod.GVPGNN(
            node_in_dim=(c.node_in, 0), node_h_dim=(c.node_h_s, c.node_h_v),
            edge_in_dim=(c.edge_in_s, 1), edge_h_dim=(c.edge_h_s, c.edge_h_v),
            num_layers=c.num_layers, vector_gate=True, readout="mean",
            drop_rate=0.0,
        ).eval()
        head = torch.nn.Linear(c.node_h_s, 20)
        sd = dict(ref.state_dict())
        sd["linear.weight"] = head.weight
        sd["linear.bias"] = head.bias
        params = ours.convert_torch_state_dict_gvpgnn(sd, c)
        return ref, head, ours, c, params

    def test_node_logits_match(self, pair):
        ref, head, ours, c, params = pair
        pos = positions(L)
        src, dst = ours.radius_graph(pos, c.radius)
        assert len(src) > 0
        rng = np.random.RandomState(1)
        feats = rng.randn(L, D_IN).astype(np.float32)
        graph = _FakeGraph(pos, src, dst)
        with torch.no_grad():
            h = ref.residue_embdding(torch.tensor(feats))
            out = ref(graph, torch.tensor(feats))
            ref_logits = head(out["node_feature"]).numpy()
        got = np.asarray(
            ours.gvpgnn_node_logits(params, c, feats, pos, src, dst)
        )
        np.testing.assert_allclose(got, ref_logits, atol=1e-4, rtol=1e-3)

    def test_scoring_contract_with_plddt_fallback(self, pair):
        """evaluate.py:98-125 scoring + task.py plddt fallback."""
        ref, head, ours, c, params = pair
        pos = positions(L)
        src, dst = ours.radius_graph(pos, c.radius)
        rng = np.random.RandomState(2)
        feats = rng.randn(L, D_IN).astype(np.float32)
        esm20 = rng.randn(L, 20).astype(np.float32)
        plddt = rng.uniform(50, 90, L).astype(np.float32)
        seq = "".join(ours.TD_RESIDUES[i] for i in rng.randint(0, 20, L))
        muts = [f"{seq[3]}4{'G' if seq[3] != 'G' else 'A'}",
                f"{seq[8]}9{'W' if seq[8] != 'W' else 'Y'}"]
        logits = ours.gvpgnn_node_logits(params, c, feats, pos, src, dst)
        got = ours.score_mutants_gvpgnn(logits, esm20, plddt, seq, muts)

        graph = _FakeGraph(pos, src, dst)
        with torch.no_grad():
            out = ref(graph, torch.tensor(feats))
            pred = head(out["node_feature"])
        pred[torch.tensor(plddt) < 70.0] = torch.tensor(
            esm20
        )[torch.tensor(plddt) < 70.0]
        logp = torch.log_softmax(pred, -1).numpy()
        idx = {a: i for i, a in enumerate(ours.TD_RESIDUES)}
        exp = []
        for m in muts:
            wt, p, mt = m[0], int(m[1:-1]) - 1, m[-1]
            exp.append(logp[p, idx[mt]] - logp[p, idx[wt]])
        np.testing.assert_allclose(got, exp, atol=1e-5, rtol=1e-5)

        # WT/empty rows score 0 (ref label_row handles row.lower()=='wt')
        wt_scores = ours.score_mutants_gvpgnn(
            logits, esm20, plddt, seq, ["WT", ""] + muts
        )
        assert wt_scores[0] == 0.0 and wt_scores[1] == 0.0
        np.testing.assert_allclose(wt_scores[2:], got)


@requires_reference
class TestS3fSurfaceParity:
    def test_surface_stream_matches(self):
        gvp_mod, _ = load_ref_s3f()
        from proteingym_tpu.models import s3f as ours

        c = ours.S3F_PRESETS["s3f_tiny"]
        ref = gvp_mod.SurfGVP(
            node_in_dim=(c.node_in, 0), node_h_dim=(c.node_h_s, c.node_h_v),
            edge_in_dim=(c.edge_in_s, 1), edge_h_dim=(c.edge_h_s, c.edge_h_v),
            surf_in_dim=(c.surf_in_s, 0), surf_edge_in_dim=(c.surf_edge_in_s, 1),
            num_surf_res_neighbor=c.num_surf_res_neighbor,
            num_surf_graph_neighbor=c.num_surf_graph_neighbor,
            num_layers=c.num_layers, vector_gate=True, readout="mean",
            drop_rate=0.0,
        ).eval()
        head = torch.nn.Linear(c.node_h_s, 20)
        sd = dict(ref.state_dict())
        sd["linear.weight"] = head.weight
        sd["linear.bias"] = head.bias
        params = ours.convert_torch_state_dict_gvpgnn(sd, c)

        pos = positions(L)
        rng = np.random.RandomState(4)
        S = 40
        surf_pos = (pos[rng.randint(0, L, S)]
                    + rng.randn(S, 3) * 2.0).astype(np.float32)
        surf_feat = rng.randn(S, c.surf_in_s).astype(np.float32)
        feats = rng.randn(L, D_IN).astype(np.float32)
        src, dst = ours.radius_graph(pos, c.radius)

        graph = _FakeGraph(pos, src, dst)
        graph.res2surf = torch.zeros(L, 1, 1, dtype=torch.long)
        surf_graph = _FakeSurfGraph(surf_pos, surf_feat)
        with torch.no_grad():
            out = ref(graph, torch.tensor(feats), surf_graph)
        ref_nodes = out["node_feature"].numpy()

        surface = ours.build_surface_inputs(
            surf_pos, surf_feat, pos, c
        )
        got = np.asarray(
            ours.gvpgnn_node_feature(
                params, c, feats, pos, src, dst, surface=surface
            )
        )
        np.testing.assert_allclose(got, ref_nodes, atol=1e-4, rtol=1e-3)
