"""ProtSSN parity vs the vendored torch pipeline: graph builder (93-dim
edge features), NormalizeProtein statistics transform, EGNN_Sparse stack,
and the log(softmax+1e-9) mutant scoring contract."""

import numpy as np
import pytest
import torch

from tests.reference_torch import load_ref_protssn, requires_reference

torch.manual_seed(0)

L = 24
K = 6
D_IN = 16  # tiny stand-in for the 1280-dim PLM reps
M_DIM = 8
N_LAYERS = 2


def make_backbone(L, seed=7):
    rng = np.random.RandomState(seed)
    ca = np.cumsum(rng.randn(L, 3) * 1.1 + np.array([3.4, 0.3, 0.2]), axis=0)
    n = ca + rng.randn(L, 3) * 0.35 + np.array([-1.2, 0.4, 0.1])
    c = ca + rng.randn(L, 3) * 0.35 + np.array([1.2, -0.4, -0.1])
    coords = np.stack([n, ca, c], axis=1).astype(np.float32)
    # hand the reference the same float32-rounded values (PDB coords carry
    # 3 decimals, so this matches production precision)
    return (coords, coords[:, 0].astype(np.float64),
            coords[:, 1].astype(np.float64), coords[:, 2].astype(np.float64))


class _FakeRec:
    def __init__(self, L):
        self._L = L

    def get_residues(self):
        return list(range(self._L))


@requires_reference
class TestProtssnParity:
    @pytest.fixture(scope="class")
    def ref_graph(self):
        network, dataset, utils = load_ref_protssn()
        coords, n, ca, c = make_backbone(L)
        ds = dataset.MutantDataset.__new__(dataset.MutantDataset)
        ds.cutoff = 30
        ds.c_alpha_max_neighbors = K
        ds.seq_dist_cut = 64
        ds.num_residue_type = 20
        ds.use_angle = False
        ds.use_omega = False
        ds.rec_residue_featurizer = (
            lambda rec, one_hot=True, add_feature=None: torch.zeros(L, 26)
        )
        graph = ds.get_calpha_graph(_FakeRec(L), ca, n, c, "A" * L)
        return network, utils, coords, graph

    def test_graph_builder_matches(self, ref_graph):
        from proteingym_tpu.models import protssn as ours

        network, utils, coords, graph = ref_graph
        src, dst, edge_attr, pos = ours.build_calpha_graph(coords, K)
        np.testing.assert_array_equal(src, graph.edge_index.numpy()[0])
        np.testing.assert_array_equal(dst, graph.edge_index.numpy()[1])
        np.testing.assert_allclose(
            edge_attr, graph.edge_attr.numpy(), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(pos, graph.pos.numpy(), atol=1e-6)

    @pytest.fixture(scope="class")
    def norm_stats(self, tmp_path_factory):
        rng = np.random.RandomState(1)
        stats = {
            "x_mean": torch.zeros(26),
            "x_std": torch.ones(26),
            "pos_mean": torch.zeros(3),
            "pos_std": torch.tensor(rng.uniform(5, 15, 3).astype(np.float32)),
            "edge_attr_mean": torch.tensor(
                rng.randn(93).astype(np.float32) * 0.1),
            "edge_attr_std": torch.tensor(
                rng.uniform(0.5, 2.0, 93).astype(np.float32)),
        }
        f = tmp_path_factory.mktemp("norm") / "stats.pt"
        torch.save(stats, f)
        return f, stats

    def test_normalize_matches(self, ref_graph, norm_stats):
        from proteingym_tpu.models import protssn as ours

        network, utils, coords, graph = ref_graph
        f, stats = norm_stats
        transform = utils.NormalizeProtein(filename=str(f))
        g = graph.clone()
        g.x = torch.zeros(L, 26)
        g.pos = graph.pos.clone()
        g.edge_attr = graph.edge_attr.clone()
        g = transform(g)

        src, dst, edge_attr, pos = ours.build_calpha_graph(coords, K)
        npos, nea = ours.apply_norm_stats(
            pos, edge_attr, ours.load_norm_stats(str(f))
        )
        np.testing.assert_allclose(npos, g.pos.numpy(), atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(
            nea, g.edge_attr.numpy(), atol=1e-5, rtol=1e-4
        )

    @pytest.fixture(scope="class")
    def egnn_pair(self, ref_graph, norm_stats):
        from proteingym_tpu.models import protssn as ours

        network, utils, coords, graph = ref_graph
        f, _ = norm_stats
        gnn_config = {
            "hidden_channels": M_DIM, "edge_attr_dim": 93, "dropout": 0,
            "n_layers": N_LAYERS, "residual": False, "embedding": False,
            "mlp_num": 2,
        }
        ref = network.EGNN(gnn_config, None, D_IN, 20).eval()
        config = ours.ProtssnEgnnConfig(
            name="tiny", input_dim=D_IN, m_dim=M_DIM, n_layers=N_LAYERS,
            k_neighbors=K,
        )
        params = ours.convert_torch_state_dict(ref.state_dict(), config)
        return ref, ours, config, params

    def test_egnn_logits_match(self, ref_graph, norm_stats, egnn_pair):
        network, utils, coords, graph = ref_graph
        f, _ = norm_stats
        ref, ours, config, params = egnn_pair
        rng = np.random.RandomState(2)
        esm_rep = rng.randn(L, D_IN).astype(np.float32)

        src, dst, edge_attr, pos = ours.build_calpha_graph(coords, K)
        npos, nea = ours.apply_norm_stats(
            pos, edge_attr, ours.load_norm_stats(str(f))
        )

        import torch_geometric

        data = torch_geometric.data.Data(
            x=torch.zeros(L, 26),
            pos=torch.tensor(npos),
            edge_index=torch.tensor(np.stack([src, dst]).astype(np.int64)),
            edge_attr=torch.tensor(nea),
            batch=torch.zeros(L, dtype=torch.long),
            esm_rep=torch.tensor(esm_rep),
        )
        with torch.no_grad():
            out, _ = ref(data)
        got = np.asarray(
            ours.egnn_logits(params, config, esm_rep, npos, src, dst, nea)
        )
        np.testing.assert_allclose(got, out.numpy(), atol=1e-4, rtol=1e-4)

    def test_mutant_scoring_contract(self, ref_graph, norm_stats, egnn_pair):
        """score = sum logp[mt]-logp[wt], logp = log(softmax(out)+1e-9)
        (ref protssn/compute_fitness.py:31-65)."""
        network, utils, coords, graph = ref_graph
        f, _ = norm_stats
        ref, ours, config, params = egnn_pair
        rng = np.random.RandomState(3)
        esm_rep = rng.randn(L, D_IN).astype(np.float32)
        src, dst, edge_attr, pos = ours.build_calpha_graph(coords, K)
        npos, nea = ours.apply_norm_stats(
            pos, edge_attr, ours.load_norm_stats(str(f))
        )
        seq = "".join(
            ours.AA_PROTSSN[i] for i in rng.randint(0, 20, L)
        )
        logp = ours.egnn_log_probs(
            params, config, esm_rep, npos, src, dst, nea
        )
        muts = [f"{seq[2]}3A" if seq[2] != "A" else f"{seq[2]}3R",
                f"{seq[5]}6W" if seq[5] != "W" else f"{seq[5]}6Y", "wt"]
        got = ours.score_mutants_egnn(logp, seq, muts)

        import torch_geometric

        data = torch_geometric.data.Data(
            x=torch.zeros(L, 26), pos=torch.tensor(npos),
            edge_index=torch.tensor(np.stack([src, dst]).astype(np.int64)),
            edge_attr=torch.tensor(nea),
            batch=torch.zeros(L, dtype=torch.long),
            esm_rep=torch.tensor(esm_rep),
        )
        with torch.no_grad():
            out, _ = ref(data)
        ref_logp = torch.log(
            torch.softmax(out[:, :20], dim=-1) + 1e-9
        ).numpy()
        aa = list("ARNDCQEGHILKMFPSTWYV")
        exp = []
        for m in muts:
            if m == "wt":
                exp.append(0.0)
                continue
            wt, pos_i, mt = m[0], int(m[1:-1]) - 1, m[-1]
            exp.append(ref_logp[pos_i, aa.index(mt)]
                       - ref_logp[pos_i, aa.index(wt)])
        np.testing.assert_allclose(got, exp, atol=1e-5, rtol=1e-5)
