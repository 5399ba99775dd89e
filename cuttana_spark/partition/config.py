"""Cuttana partitioner hyperparameters.

Parity with the reference's CuttanaConfig (/root/reference/src/config.rs:2-56):
same eight knobs, same defaults, same validation (balance_slack >= 0), plus a
seed — the reference breaks score ties with an OS-seeded ThreadRng
(/root/reference/src/partition.rs:115-124), which makes its per-vertex output
nondeterministic; we use a seeded generator so runs are reproducible and
golden-metric parity is checkable.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CuttanaConfig:
    num_sub_partitions: int = 4096
    balance_slack: float = 0.05
    max_buffer_size: int = 1_000_000
    buffer_degree_threshold: int = 100
    gamma: float = 1.5
    sub_gamma: float = 1.0
    theta: float = 2.0
    info_gain_threshold: int = 0
    seed: int = 42
    # paper Case-2 eviction plans in refinement: measured ±0.3% cut for up
    # to 9× the refinement wall on the BA goldens (BENCH_EVICTIONS_r3.json)
    # — off by default, on for full-paper-semantics parity runs
    enable_eviction_plans: bool = False

    def __post_init__(self):
        if self.balance_slack < 0.0:
            raise ValueError("balance_slack must be >= 0")
        if self.num_sub_partitions <= 0:
            raise ValueError("num_sub_partitions must be > 0")
        if self.max_buffer_size <= 0:
            raise ValueError("max_buffer_size must be > 0")

    @property
    def phase1_slack(self) -> float:
        """Streaming phase runs with doubled slack so refinement has headroom
        (/root/reference/src/state.rs:61-63)."""
        return min(self.balance_slack * 2.0, self.balance_slack + 0.5)
