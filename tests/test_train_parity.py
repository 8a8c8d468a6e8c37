"""Torch-vs-JAX training parity: same init (ported), same batches, same
Adam — loss curves must track to f32 noise (certifies gradients end to
end; the reference only checks inference parity)."""

import sys

sys.path.insert(0, "experiments")


def test_training_curves_match_torch():
    from train_parity import run

    jl, tl, rel = run(steps=12, batch_size=8, hidden=16, layers=2,
                      verbose=False)
    assert rel.max() < 1e-3, rel.max()
