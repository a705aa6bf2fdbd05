"""Opening-book restart parity (book.h:9-16 + GetInitState
self_play_thread.cc:216-232): with play_from_book_prob=1 every fresh
restart starts from a legal book prefix with correct colors/counts."""
import numpy as np

from p3achygo_tpu.constants import BOARD_LEN
from p3achygo_tpu.selfplay.book import OPENING_BOOK, sample_book_prefix


def _flat(line):
    return [r * BOARD_LEN + c for r, c in line]


def test_prefix_is_book_line_prefix():
    rng = np.random.default_rng(0)
    lines = [_flat(l) for l in OPENING_BOOK]
    seen_lens = set()
    for _ in range(200):
        prefix = sample_book_prefix(rng)
        seen_lens.add(len(prefix))
        assert any(prefix == l[:len(prefix)] for l in lines), prefix
        assert len(set(prefix)) == len(prefix)  # legal: no repeats
    # uniform num_moves 0..4 (minus repeat truncation) -> all lengths hit
    assert {0, 1, 2, 3, 4} >= seen_lens and len(seen_lens) >= 4


def test_restart_batch_uses_book():
    import jax.numpy as jnp

    from p3achygo_tpu.rl.config import RunConfig
    from p3achygo_tpu.rl.loop import GenerationLoop

    cfg = RunConfig(model_config="tiny", selfplay_batch_size=8,
                    games_first_gen=8, games_per_gen=8,
                    play_from_book_prob=1.0, handicap_game_prob=0.0,
                    use_seen_state_prob=0.0, randomize_komi=False)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        loop = GenerationLoop(cfg, td, seed=3)
        init, use, komi, no_raw, force = loop._build_restart_batch(
            list(range(8)))
        stones = np.asarray(init.stones)
        mc = np.asarray(init.move_count)
        tm = np.asarray(init.to_move)
        lines = [_flat(l) for l in OPENING_BOOK]
        nonempty = 0
        for b in range(8):
            n = int(mc[b])
            occ = np.flatnonzero(stones[b])
            assert len(occ) == n  # book prefixes never capture
            # color alternation: BLACK played ceil(n/2) stones
            assert (stones[b] == 1).sum() == (n + 1) // 2
            assert (stones[b] == -1).sum() == n // 2
            assert tm[b] == (1 if n % 2 == 0 else -1)
            if n:
                nonempty += 1
                played = set(occ.tolist())
                assert any(set(l[:n]) == played for l in lines), (b, played)
        assert nonempty >= 4  # num_moves ~ U{0..4}: most restarts nonempty
        assert bool(np.asarray(use).all())
