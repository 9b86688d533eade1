"""Learning-rate schedule: staircase exponential decay, as
``tf.train.exponential_decay(..., staircase=True)`` in the reference trainer
(/root/reference/model/train_single_gpu.py:45-49)."""

import optax


def staircase_exponential_decay(init_lr: float, decay_steps: int,
                                decay_factor: float):
    return optax.exponential_decay(
        init_value=init_lr,
        transition_steps=max(int(decay_steps), 1),
        decay_rate=decay_factor,
        staircase=True,
    )
