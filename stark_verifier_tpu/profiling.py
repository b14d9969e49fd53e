"""Tracing / metrics for verification runs (SURVEY.md section 5).

The reference's only instrumentation is two wall-clock prints
(reference: /root/reference/src/main.rs:214-226).  Here: named phase timers
(jax.profiler annotations when tracing), and a structured metrics report for
benchmark runs -- proofs/s/chip, hash-compressions/s, p50 latency.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field, asdict

import jax

# Blake2s compressions per proof for the default statement family
# (derived in SURVEY.md section 3.3 from proof.bin's branch counts/depths)
COMPRESSIONS_PER_PROOF = (
    sum(40 * (1 + d) for d in (13, 11, 9, 7, 5))        # FRI columns
    + sum(160 * (1 + d) for d in (15, 13, 11, 9, 7))    # FRI rows
    + 160 * (3 + 15)                                    # main (3-block leaves)
    + 80 * (1 + 15)                                     # lincomb
    + 5 * 4 + 9 + 4                                     # PRGs + k1..k4
)


@dataclass
class PhaseTimes:
    phases: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        with jax.named_scope(name):
            t = time.perf_counter()
            yield
            self.phases[name] = self.phases.get(name, 0.0) + (
                time.perf_counter() - t)


@dataclass
class BenchReport:
    batch: int
    iters: int
    p50_s: float
    device: str
    n_devices: int = 1

    @property
    def proofs_per_s(self) -> float:
        return self.batch / self.p50_s

    @property
    def proofs_per_s_per_chip(self) -> float:
        return self.proofs_per_s / max(self.n_devices, 1)

    @property
    def compressions_per_s(self) -> float:
        return self.proofs_per_s * COMPRESSIONS_PER_PROOF

    def to_json(self) -> str:
        d = asdict(self)
        d.update(proofs_per_s=round(self.proofs_per_s, 2),
                 proofs_per_s_per_chip=round(self.proofs_per_s_per_chip, 2),
                 compressions_per_s=round(self.compressions_per_s))
        return json.dumps(d)


@contextlib.contextmanager
def maybe_trace(enable: bool, out_dir: str = "./trace"):
    if enable:
        with jax.profiler.trace(out_dir):
            yield
    else:
        yield
