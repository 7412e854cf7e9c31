"""HBM memory estimates for proving — the segmentation planner.

Plays the role of the reference's ``memory_metering.rs`` (whose constants
mirror the CUDA buffer model): callers use it to decide how much work fits
in one proof on one chip. The formulas here model *this* backend's JAX/HBM
buffer lifetimes:

- main traces live on device for the whole prove (u32 Monty);
- each commitment caches the stacked matrix and the RS codeword matrix
  (the codeword backs WHIR query openings);
- the batch-constraint phase holds folded EF part matrices (local + rotated)
  whose size is main_cells * D_EF / 2^l_skip per opening, plus the round-0
  coset-evaluation grid (num_cosets * lifted cells, base field);
- the GKR phase holds the full fraction-tree layer stack: 2x the input
  leaves, each leaf a (p, q) EF pair;
- WHIR holds f_evals and w_evals (2^m EF each) plus the folded codeword
  trees.

XLA owns allocation (arena + donation), so unlike the CUDA VPMM model there
is no allocator overhead term; we add a fixed compiler-scratch allowance.
"""

from __future__ import annotations

from dataclasses import dataclass

from .params import SystemParams

BASE_FIELD_SIZE = 4  # uint32 Monty
EXT_DEGREE = 4
DIGEST_SIZE = 8 * BASE_FIELD_SIZE
XLA_SCRATCH_OVERHEAD = 256 << 20


@dataclass
class ProvingMemoryCounts:
    main_cells_with_rot: int
    main_cells_without_rot: int
    interaction_cells: int

    @property
    def main_cells(self) -> int:
        return self.main_cells_with_rot + self.main_cells_without_rot


@dataclass
class ProvingMemoryEstimate:
    total: int
    main: int
    stacked_matrix: int
    rs_code_matrix: int
    batch_constraint: int
    gkr: int
    whir: int
    secondary_peak: int


@dataclass
class ProvingMemoryConfig:
    l_skip: int
    n_stack: int
    log_blowup: int
    k_whir: int
    max_constraint_degree: int
    cache_stacked_matrix: bool = True
    cache_rs_code_matrix: bool = True
    # chunked round-0 coset grids (8 segments); see ProverConfig
    zerocheck_save_memory: bool = False

    @staticmethod
    def from_params(
        params: SystemParams,
        cache_stacked_matrix: bool = True,
        cache_rs_code_matrix: bool = True,
        zerocheck_save_memory: bool = False,
    ) -> "ProvingMemoryConfig":
        return ProvingMemoryConfig(
            l_skip=params.l_skip,
            n_stack=params.n_stack,
            log_blowup=params.log_blowup,
            k_whir=params.k_whir,
            max_constraint_degree=params.max_constraint_degree,
            cache_stacked_matrix=cache_stacked_matrix,
            cache_rs_code_matrix=cache_rs_code_matrix,
            zerocheck_save_memory=zerocheck_save_memory,
        )

    @property
    def log_stacked_height(self) -> int:
        return self.l_skip + self.n_stack

    def main_memory_bytes(self, main_cells: int) -> int:
        return main_cells * BASE_FIELD_SIZE

    def _stacked_cells(self, main_cells: int) -> int:
        h = 1 << self.log_stacked_height
        return -(-main_cells // h) * h

    def stacked_matrix_memory_bytes(self, main_cells: int) -> int:
        if not self.cache_stacked_matrix:
            return 0
        return self._stacked_cells(main_cells) * BASE_FIELD_SIZE

    def rs_code_matrix_memory_bytes(self, main_cells: int) -> int:
        return (
            self._stacked_cells(main_cells)
            * (1 << self.log_blowup)
            * BASE_FIELD_SIZE
        )

    def batch_constraint_memory_bytes(self, counts: ProvingMemoryCounts) -> int:
        # folded EF part matrices: height/2^l_skip rows of EF per column,
        # doubled for rotated variants
        per_cell = EXT_DEGREE * BASE_FIELD_SIZE
        folded = (
            counts.main_cells_with_rot * 2 + counts.main_cells_without_rot
        ) * per_cell >> self.l_skip
        # round-0 coset grid: num_cosets lifted copies in base field (plus
        # the EF accumulator of the same footprint); the save-memory policy
        # materializes 1/8 of it at a time
        num_cosets = max(self.max_constraint_degree - 1, 1)
        round0 = counts.main_cells * num_cosets * (
            BASE_FIELD_SIZE + EXT_DEGREE * BASE_FIELD_SIZE
        )
        if self.zerocheck_save_memory:
            round0 //= 8
        return max(folded, round0) + XLA_SCRATCH_OVERHEAD

    def gkr_memory_bytes(self, interaction_cells: int) -> int:
        if interaction_cells == 0:
            return 0
        leaf_bytes = 2 * EXT_DEGREE * BASE_FIELD_SIZE  # (p, q) EF pair
        logical = 1 << (interaction_cells.bit_length())
        # full layer stack = 2x leaves; eq table + fold scratch ~ one layer
        return 3 * logical * leaf_bytes + XLA_SCRATCH_OVERHEAD

    def whir_memory_bytes(self) -> int:
        m = 1 << self.log_stacked_height
        codeword_h = m << self.log_blowup
        f_and_w = 2 * m * EXT_DEGREE * BASE_FIELD_SIZE
        g_codeword = (codeword_h >> 1) * EXT_DEGREE * BASE_FIELD_SIZE
        trees = 2 * DIGEST_SIZE * (codeword_h >> self.k_whir)
        return f_and_w + g_codeword + trees + XLA_SCRATCH_OVERHEAD

    def estimate(self, counts: ProvingMemoryCounts) -> ProvingMemoryEstimate:
        main_cells = counts.main_cells
        main = self.main_memory_bytes(main_cells)
        stacked = self.stacked_matrix_memory_bytes(main_cells)
        rs = self.rs_code_matrix_memory_bytes(main_cells)
        batch = self.batch_constraint_memory_bytes(counts)
        gkr = self.gkr_memory_bytes(counts.interaction_cells)
        whir = self.whir_memory_bytes()
        batch_or_gkr = max(batch, gkr)
        if self.cache_rs_code_matrix:
            secondary = rs + max(whir, batch_or_gkr)
        else:
            secondary = max(rs + whir, batch_or_gkr)
        total = main + stacked + secondary
        return ProvingMemoryEstimate(
            total=total,
            main=main,
            stacked_matrix=stacked,
            rs_code_matrix=rs,
            batch_constraint=batch,
            gkr=gkr,
            whir=whir,
            secondary_peak=secondary,
        )


def fits_in_hbm(
    params: SystemParams, counts: ProvingMemoryCounts, hbm_bytes: int = 16 << 30
) -> bool:
    """Segmentation predicate: does this workload fit on one chip?"""
    cfg = ProvingMemoryConfig.from_params(params)
    return cfg.estimate(counts).total <= hbm_bytes
