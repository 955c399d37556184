"""Pure numpy/python semantics kernel — the reference-fidelity oracle.

Everything in here is Spark-free and torch-free. The Spark operators import
this module on executors (shipped via --py-files) so the distributed
pipeline and the single-process oracle share one implementation of
tokenization, scoring, and decoding — parity then measures *pipeline
plumbing* (batching, padding, shuffles), exactly the failure modes that
matter when grafting the reference's semantics onto Spark.
"""

from .tokenizer import TOKEN_RE, tokenize_with_offsets  # noqa: F401
from .scorer import HashedBiEncoder  # noqa: F401
from .decode import (  # noqa: F401
    greedy_search_reference,
    greedy_select,
    threshold_candidates,
)
from .metrics import compute_prf_micro, triple_prf  # noqa: F401
