"""p3achygo_tpu: a TPU-native AlphaZero Go framework.

Brand-new JAX/XLA/Pallas re-design of the capabilities of
p3achyjr/p3achygo (see SURVEY.md): vectorized rules engine, batched
Gumbel/PUCT MCTS, on-device model inference, self-play/replay/training/eval
as one sharded actor-learner program.
"""
__version__ = "0.1.0"
