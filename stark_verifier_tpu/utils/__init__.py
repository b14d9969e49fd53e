"""Shared utilities: profiling/metrics, limb codecs, compile-cache control.

Thin namespace over the host-side helpers so callers have one import point:

    from stark_verifier_tpu.utils import BenchReport, PhaseTimes, maybe_trace
    from stark_verifier_tpu.utils import int_to_limbs, limbs_to_int
"""

from ..profiling import (BenchReport, PhaseTimes, maybe_trace,  # noqa: F401
                         COMPRESSIONS_PER_PROOF)
from ..fp import (int_to_limbs, limbs_to_int, ints_to_limbs,  # noqa: F401
                  be_bytes_to_limbs, bytes_to_le_words, pow2_table, pow4_table)
from .. import enable_compile_cache  # noqa: F401
