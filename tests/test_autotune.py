"""Tile-autotuner tests (kernels/autotune.py): candidate generation, the
interpret-mode sweep, cache persistence, and the _auto_tiles precedence chain
(tuned overlay > baked _BEST_TILES > divisor heuristic)."""

import json

import pytest

from conceptattention_tpu.kernels import autotune, flash_saliency
from conceptattention_tpu.kernels.autotune import (
    DEFAULT_TILE_ELEM_BUDGET,
    autotune_tiles,
    candidate_tiles,
    load_tile_cache,
    register_tuned_tiles,
)
from conceptattention_tpu.kernels.flash_saliency import _auto_tiles


@pytest.fixture(autouse=True)
def _clean_overlay():
    """Isolate the runtime tile overlay (and its lazy cache load) per test."""
    saved = dict(flash_saliency._TUNED_TILES)
    saved_flag = flash_saliency._tile_cache_loaded
    flash_saliency._tile_cache_loaded = True  # don't read the user cache
    yield
    flash_saliency._TUNED_TILES.clear()
    flash_saliency._TUNED_TILES.update(saved)
    flash_saliency._tile_cache_loaded = saved_flag


class TestCandidates:
    def test_prefers_exact_divisors_within_budget(self):
        cands = candidate_tiles(4608)
        assert cands, "no candidates for the flux double shape"
        for bq, bk in cands:
            assert bq * bk <= DEFAULT_TILE_ELEM_BUDGET
            assert bq % 32 == 0 and bk % 128 == 0
        # the top candidate divides S exactly on both axes
        bq, bk = cands[0]
        assert 4608 % bq == 0 and 4608 % bk == 0
        # the production-measured best is in the pool
        assert (768, 1536) in cands

    def test_tiny_sequence_gets_full_tile(self):
        assert candidate_tiles(128) == [(128, 128)]

    def test_candidates_bounded_by_sequence(self):
        for bq, bk in candidate_tiles(512):
            assert bq <= 512 and bk <= 512


class TestPrecedence:
    def test_tuned_overlay_beats_baked_table(self, monkeypatch):
        # Hermetic: the developer's ~/.cache tile overlay must not leak into
        # the baked-table assertion (on-chip sweeps write real entries there).
        from conceptattention_tpu.kernels import flash_saliency as fs

        monkeypatch.setattr(fs, "_TUNED_TILES", {})
        monkeypatch.setattr(fs, "_tile_cache_loaded", True)
        assert _auto_tiles(4608) == (576, 1536)  # baked v5e table (round-5
        # in-model A/B: 576 beat the round-4 isolated-kernel pick 768)
        register_tuned_tiles(4608, (512, 1024))
        assert _auto_tiles(4608) == (512, 1024)

    def test_heuristic_when_untable(self):
        bq, bk = _auto_tiles(2304)  # 512x1024-class grid, not in any table
        assert 2304 % bq == 0 or (bq, bk) == (512, 1024)


class TestSweepAndCache:
    def test_autotune_roundtrip(self, tmp_path):
        cache = str(tmp_path / "tiles.json")
        cands = [(128, 128), (256, 256)]
        best = autotune_tiles(
            256, batch=1, heads=1, head_dim=128,
            candidates=cands, iters=2, cache_path=cache, interpret=True,
        )
        assert best in cands
        # winner registered in the live overlay
        assert _auto_tiles(256) == best
        # ... and persisted under this device kind
        data = json.load(open(cache))
        (kind,) = data.keys()
        ent = data[kind]["256"]
        assert (ent["block_q"], ent["block_k"]) == best
        assert ent["tflops"] > 0
        # a fresh process would load it back
        flash_saliency._TUNED_TILES.clear()
        loaded = load_tile_cache(cache)
        assert loaded == {256: best}
        assert _auto_tiles(256) == best

    def test_infeasible_candidates_skipped(self, tmp_path, monkeypatch):
        cache = str(tmp_path / "tiles.json")
        real = autotune.measure_tile

        def failing(s, bq, bk, *a, **kw):
            if (bq, bk) == (192, 192):  # simulate a VMEM OOM on this chip
                raise RuntimeError("RESOURCE_EXHAUSTED: vmem")
            return real(s, bq, bk, *a, **kw)

        monkeypatch.setattr(autotune, "measure_tile", failing)
        best = autotune_tiles(
            256, batch=1, heads=1, head_dim=128,
            candidates=[(192, 192), (128, 128)], iters=2,
            cache_path=cache, interpret=True,
        )
        assert best == (128, 128)

    def test_all_infeasible_raises(self, tmp_path, monkeypatch):
        monkeypatch.setattr(
            autotune, "measure_tile",
            lambda *a, **kw: (_ for _ in ()).throw(RuntimeError("vmem")),
        )
        with pytest.raises(RuntimeError, match="no feasible"):
            autotune_tiles(
                256, batch=1, heads=1, head_dim=128,
                candidates=[(192, 192)], iters=2,
                cache_path=str(tmp_path / "t.json"), interpret=True,
            )

    def test_corrupt_cache_is_ignored(self, tmp_path):
        cache = tmp_path / "tiles.json"
        cache.write_text("{not json")
        assert load_tile_cache(str(cache)) == {}

    def test_bare_filename_cache_path(self, tmp_path, monkeypatch):
        # a cache path with no directory component must not lose the sweep
        monkeypatch.chdir(tmp_path)
        best = autotune_tiles(
            256, batch=1, heads=1, head_dim=128,
            candidates=[(128, 128)], iters=2,
            cache_path="tiles.json", interpret=True,
        )
        assert load_tile_cache("tiles.json") == {256: best}
