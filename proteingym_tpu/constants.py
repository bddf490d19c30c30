"""Global alphabets and benchmark vocabulary.

Semantics match the reference's shared constants
(ref: proteingym/utils/scoring_utils.py:5-7, proteingym/utils/msa_utils.py:17-22).
"""

# Canonical 20-letter amino-acid vocabulary, alphabetical by one-letter code.
AA_VOCAB = "ACDEFGHIKLMNPQRSTVWY"

# Rare amino acids: pyrrolysine (O) and selenocysteine (U).
UNUSUAL_AA = "OU"

# Ambiguity codes: B = Asn/Asp, J = Leu/Ile, X = unknown, Z = Gln/Glu.
INDETERMINATE_AA = "BJXZ"

GAP = "-"
MATCH_GAP = GAP
INSERT_GAP = "."

ALPHABET_PROTEIN_NOGAP = AA_VOCAB
ALPHABET_PROTEIN_GAP = GAP + AA_VOCAB

AA_TO_IDX = {aa: i for i, aa in enumerate(AA_VOCAB)}
IDX_TO_AA = {i: aa for i, aa in enumerate(AA_VOCAB)}

# Gapped alphabet index map (gap = 0), used by the sequence-weight kernel
# (ref: proteingym/utils/weights.py:228-235 — GAP maps to 0, unknowns -> gap).
AA_GAP_TO_IDX = {aa: i for i, aa in enumerate(ALPHABET_PROTEIN_GAP)}

# Benchmark aggregation vocabulary (ref: performance_DMS_benchmarks.py:339-348).
MSA_DEPTH_CATEGORIES = ("Low", "Medium", "High")
TAXA = ("Human", "Eukaryote", "Prokaryote", "Virus")
FUNCTION_CATEGORIES = (
    "Activity",
    "Binding",
    "Expression",
    "OrganismalFitness",
    "Stability",
)
MUTATION_DEPTHS = ("1", "2", "3", "4", "5+")
METRICS = ("Spearman", "AUC", "MCC", "NDCG", "Top_recall")
