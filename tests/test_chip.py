"""Per-chip tuning derivation: v5e keeps its measured constants, other
chips scale rather than silently inheriting them (VERDICT r2 item 6)."""

from calm_tpu import chip


def test_v5e_matches_measured_constants():
    t = chip._tuning_for("TPU v5 lite", 17_179_869_184)
    assert t.qmm_tile_bytes == 7 << 20
    assert t.attn_block_bytes == 8 << 20
    assert t.vmem_limit_bytes == 100 << 20
    # 0.845 of the live 16 GiB bytes_limit ~= the measured 14.5 GB budget
    assert 14_000_000_000 <= t.hbm_budget <= 14_800_000_000


def test_v5p_scales_tiles_and_budget():
    t = chip._tuning_for("TPU v5p", None)
    assert t.hbm_gbps == 2765.0
    assert t.qmm_tile_bytes > 7 << 20          # faster HBM -> bigger DMAs
    assert t.qmm_tile_bytes <= 16 << 20        # still VMEM-double-bufferable
    assert t.attn_block_bytes > 8 << 20
    assert t.hbm_budget > 80 * 10**9           # 95 GiB part, minus slack


def test_live_bytes_limit_overrides_nominal():
    nominal = chip._tuning_for("TPU v6e", None)
    limited = chip._tuning_for("TPU v6e", 20_000_000_000)
    assert limited.hbm_budget < nominal.hbm_budget
    assert limited.hbm_budget == int(20_000_000_000 * 0.845)


def test_unknown_chip_falls_back_safely():
    t = chip._tuning_for("cpu", None)
    assert t.hbm_budget == 14_500_000_000      # mimic v5e decisions in tests
    assert t.qmm_tile_bytes == 7 << 20


def test_prefix_match_prefers_longest():
    assert chip._match_chip("TPU v5 lite") == (16, 819.0)
    assert chip._match_chip("TPU v5p something") == (95, 2765.0)
