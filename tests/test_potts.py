import numpy as np
import pytest

from proteingym_tpu.models.potts import (
    PottsModel,
    hamiltonian,
    read_plmc_model,
    train_potts_plm,
    train_site_independent,
    write_plmc_model,
)

ALPHABET = "-ACDEFGHIKLMNPQRSTVWY"


def _random_model(rng, L=12, q=21, seed_seq="ACDEFGHIKLMN"):
    h = rng.normal(size=(L, q))
    J = rng.normal(size=(L, L, q, q)) * 0.1
    # symmetrize, zero diagonal (plmc convention)
    J = 0.5 * (J + np.transpose(J, (1, 0, 3, 2)))
    J[np.arange(L), np.arange(L)] = 0.0
    f = rng.random(size=(L, q))
    f /= f.sum(axis=1, keepdims=True)
    return PottsModel(
        h=h,
        J=J,
        alphabet=ALPHABET,
        index_list=np.arange(1, L + 1),
        target_seq=seed_seq[:L],
        f_i=f,
        neff=123.4,
        weights=rng.random(size=50),
    )


def test_delta_hamiltonian_single_matches_bruteforce(rng):
    m = _random_model(rng)
    wt = m.encode(m.target_seq)
    e_wt = hamiltonian(m, wt)
    for mut in ["A1C", "C2W", "N12Y"]:
        f, p, t = mut[0], int(mut[1:-1]), mut[-1]
        codes = wt.copy()
        codes[p - 1] = m.encode(t)[0]
        expected = hamiltonian(m, codes) - e_wt
        got = m.delta_hamiltonians([mut])[0]
        assert got == pytest.approx(expected, abs=1e-8), mut


def test_delta_hamiltonian_multiple_matches_bruteforce(rng):
    m = _random_model(rng)
    wt = m.encode(m.target_seq)
    e_wt = hamiltonian(m, wt)
    muts = ["A1C:C2W", "A1G:E4W:I8K", "D3R:F5Y:G6A:H7C:K9W"]
    got = m.delta_hamiltonians(muts)
    for mut, g in zip(muts, got):
        codes = wt.copy()
        for tok in mut.split(":"):
            codes[int(tok[1:-1]) - 1] = m.encode(tok[-1])[0]
        expected = hamiltonian(m, codes) - e_wt
        assert g == pytest.approx(expected, abs=1e-8), mut


def test_delta_hamiltonian_invalid_is_nan(rng):
    m = _random_model(rng)
    out = m.delta_hamiltonians(["A99C", "A1C"])
    assert np.isnan(out[0])
    assert np.isfinite(out[1])


def test_delta_hamiltonian_offset(rng):
    m = _random_model(rng)
    # position written in original numbering 25 with offset -24 -> model pos 1
    base = m.delta_hamiltonians(["A1C"])[0]
    shifted = m.delta_hamiltonians(["A25C"], offset=-24)[0]
    assert shifted == pytest.approx(base, abs=1e-12)


def test_independent_model(rng):
    m = _random_model(rng)
    ind = m.to_independent_model()
    assert np.all(ind.J == 0)
    # dE = log f(p,t) - log f(p,f)
    got = ind.delta_hamiltonians(["A1C"])[0]
    ai = ALPHABET.index("A")
    ci = ALPHABET.index("C")
    expected = np.log(m.f_i[0, ci]) - np.log(m.f_i[0, ai])
    assert got == pytest.approx(expected, abs=1e-8)


def test_plmc_roundtrip(tmp_path, rng):
    m = _random_model(rng)
    path = tmp_path / "test.model"
    write_plmc_model(m, path)
    m2 = read_plmc_model(path)
    assert m2.alphabet == m.alphabet
    assert m2.target_seq == m.target_seq
    np.testing.assert_allclose(m2.h, m.h, atol=1e-6)
    np.testing.assert_allclose(m2.J, m.J, atol=1e-6)
    np.testing.assert_allclose(m2.f_i, m.f_i, atol=1e-6)
    np.testing.assert_array_equal(m2.index_list, m.index_list)
    # scores agree
    muts = ["A1C", "A1G:E4W"]
    np.testing.assert_allclose(
        m2.delta_hamiltonians(muts), m.delta_hamiltonians(muts), atol=1e-4
    )


def test_site_independent_trainer(rng):
    # two-column toy MSA where col 0 is mostly A, col 1 mostly C
    codes = {c: ALPHABET.index(c) for c in "ACD"}
    matrix = np.array(
        [[codes["A"], codes["C"]]] * 8 + [[codes["D"], codes["C"]]] * 2,
        dtype=np.int32,
    )
    w = np.ones(10)
    m = train_site_independent(matrix, w, ALPHABET, np.arange(1, 3), "AC")
    # A more frequent than D at position 1 -> A->D substitution unfavorable
    assert m.delta_hamiltonians(["A1D"])[0] < 0
    np.testing.assert_allclose(m.f_i[0, codes["A"]], 0.8)


def test_plm_trainer_recovers_preferences(rng):
    # site 0 prefers A strongly; site 1 prefers C; couplings near zero
    codes = {c: ALPHABET.index(c) for c in "ACDW"}
    n = 200
    col0 = rng.choice([codes["A"], codes["D"]], size=n, p=[0.9, 0.1])
    col1 = rng.choice([codes["C"], codes["W"]], size=n, p=[0.85, 0.15])
    matrix = np.stack([col0, col1], axis=1).astype(np.int32)
    m = train_potts_plm(
        matrix, np.ones(n), ALPHABET, np.arange(1, 3), "AC", steps=200
    )
    assert m.delta_hamiltonians(["A1D"])[0] < 0
    assert m.delta_hamiltonians(["C2W"])[0] < 0
