"""Minimal PDB backbone parsing for structure-conditioned models.

The reference parses PDBs with biotite / custom code per baseline
(ref protein_mpnn/compute_fitness.py parse_PDB, esm inverse_folding
util.py). Here one shared parser extracts the (L, 4, 3) N/Ca/C/O backbone
tensor consumed by ProteinMPNN-style featurization.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

BACKBONE_ATOMS = ("N", "CA", "C", "O")


def parse_pdb_backbone(
    path: str | Path, chain: Optional[str] = None
) -> Tuple[np.ndarray, str]:
    """Parse ATOM records -> ((L, 4, 3) coords, one-letter sequence).

    Residues missing any backbone atom are dropped. Only the first model
    and (by default) the first chain encountered are read.
    """
    three_to_one = {
        "ALA": "A", "ARG": "R", "ASN": "N", "ASP": "D", "CYS": "C",
        "GLN": "Q", "GLU": "E", "GLY": "G", "HIS": "H", "ILE": "I",
        "LEU": "L", "LYS": "K", "MET": "M", "PHE": "F", "PRO": "P",
        "SER": "S", "THR": "T", "TRP": "W", "TYR": "Y", "VAL": "V",
        "MSE": "M", "SEC": "U", "PYL": "O",
    }
    residues: Dict[tuple, Dict[str, np.ndarray]] = {}
    res_names: Dict[tuple, str] = {}
    picked_chain = chain
    with open(path) as f:
        for line in f:
            if line.startswith("ENDMDL"):
                break
            if not line.startswith("ATOM"):
                continue
            atom = line[12:16].strip()
            if atom not in BACKBONE_ATOMS:
                continue
            ch = line[21]
            if picked_chain is None:
                picked_chain = ch
            if ch != picked_chain:
                continue
            altloc = line[16]
            if altloc not in (" ", "A"):
                continue
            key = (ch, line[22:27])  # resseq + icode
            xyz = np.array(
                [float(line[30:38]), float(line[38:46]), float(line[46:54])]
            )
            residues.setdefault(key, {})[atom] = xyz
            res_names[key] = line[17:20].strip()

    coords, seq = [], []
    for key in residues:
        r = residues[key]
        if all(a in r for a in BACKBONE_ATOMS):
            coords.append(np.stack([r[a] for a in BACKBONE_ATOMS]))
            seq.append(three_to_one.get(res_names[key], "X"))
    if not coords:
        raise ValueError(f"No complete backbone residues in {path}")
    return np.stack(coords), "".join(seq)


def synthetic_helix_backbone(sequence_len: int, seed: int = 0) -> np.ndarray:
    """Idealized alpha-helix backbone (testing / smoke structures)."""
    rs = np.random.RandomState(seed)
    t = np.arange(sequence_len)
    # helix: rise 1.5 A/residue, 100 deg/residue, radius 2.3 A
    theta = np.deg2rad(100.0) * t
    ca = np.stack(
        [2.3 * np.cos(theta), 2.3 * np.sin(theta), 1.5 * t], axis=-1
    )
    n = ca + np.array([-0.5, 0.8, -0.9]) + 0.01 * rs.randn(sequence_len, 3)
    c = ca + np.array([0.7, 0.6, 0.9]) + 0.01 * rs.randn(sequence_len, 3)
    o = c + np.array([0.6, -1.0, 0.2]) + 0.01 * rs.randn(sequence_len, 3)
    return np.stack([n, ca, c, o], axis=1)


def parse_pdb_bfactors(path, chain=None) -> np.ndarray:
    """Per-residue CA b-factor (AF2 PDBs store pLDDT there — the S3F task
    uses it for its low-confidence fallback, ref S3F/s3f/task.py:88-91).
    Residues counted exactly as parse_pdb_backbone (complete backbones)."""
    bfac: Dict[tuple, float] = {}
    have: Dict[tuple, set] = {}
    picked_chain = chain
    with open(path) as f:
        for line in f:
            if line.startswith("ENDMDL"):
                break
            if not line.startswith("ATOM"):
                continue
            atom = line[12:16].strip()
            if atom not in BACKBONE_ATOMS:
                continue
            ch = line[21]
            if picked_chain is None:
                picked_chain = ch
            if ch != picked_chain:
                continue
            if line[16] not in (" ", "A"):
                continue
            key = (ch, line[22:27])
            have.setdefault(key, set()).add(atom)
            if atom == "CA":
                try:
                    bfac[key] = float(line[60:66])
                except ValueError:
                    bfac[key] = 0.0
    out = [bfac.get(k, 0.0) for k, atoms in have.items()
           if atoms >= set(BACKBONE_ATOMS)]
    return np.asarray(out, np.float32)
