"""Quantify gating (promotion) error vs games played — VERDICT r3 item 7.

The RL loop promotes a candidate iff relative Elo > 0, i.e. strictly more
than half the gating games won (rl/loop.py:627-638; mirrors the reference
eval/main.cc:455-470 and train_sp_eval.py:31-33 which gates on 100 games).

Under the post-noise-fix harness (eval/harness.py:50-57) gating games are
independent, so the promotion probability is exactly the binomial tail
    P(promote | true delta d, N games) = P(Bin(N, p(d)) > N/2),
    p(d) = 1 / (1 + 10^(-d/400)).
Ties (exactly N/2) count as NOT promoted (elo == 0 is not > 0).

We report, per N: false-promotion rate for a -50/-25 Elo candidate, the
no-op promotion rate at d=0, and false-rejection rate for a +25/+50/+100
Elo candidate. CPU-only, exact (no Monte Carlo).
"""
import math


def p_win(delta_elo: float) -> float:
    return 1.0 / (1.0 + 10.0 ** (-delta_elo / 400.0))


def promote_prob(delta_elo: float, n_games: int) -> float:
    """P(wins > n/2) exactly, via binomial pmf accumulation."""
    p = p_win(delta_elo)
    need = n_games // 2 + 1  # strict majority
    total = 0.0
    logp, log1p_ = math.log(p), math.log1p(-p)
    for k in range(need, n_games + 1):
        logpmf = (math.lgamma(n_games + 1) - math.lgamma(k + 1)
                  - math.lgamma(n_games - k + 1) + k * logp
                  + (n_games - k) * log1p_)
        total += math.exp(logpmf)
    return total


def main():
    deltas = [-100, -50, -25, 0, 25, 50, 100]
    game_counts = [48, 96, 100, 128, 200, 256, 400]
    print("P(promote) by true candidate-vs-golden Elo delta:")
    header = "  N    " + "".join(f"{d:>9}" for d in deltas)
    print(header)
    for n in game_counts:
        row = f"  {n:<5}" + "".join(f"{promote_prob(d, n):9.3f}"
                                    for d in deltas)
        print(row)
    print()
    # The decision rule quality: false-promotion of a -50 candidate and
    # false-rejection of a +50 candidate, per N.
    print("error rates (false-promote d=-50 / false-reject d=+50):")
    for n in game_counts:
        fp = promote_prob(-50, n)
        fr = 1 - promote_prob(50, n)
        print(f"  N={n:<4} false-promote={fp:6.3f}  false-reject={fr:6.3f}")


if __name__ == "__main__":
    main()
