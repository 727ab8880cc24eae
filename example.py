#!/usr/bin/env python
"""Shape-semantics scratchpad (parity with /root/reference/example.py).

The reference used a TF1 session to print tf.split / slim.softmax shapes
(example.py:4-27); this is the JAX equivalent of the same exploration.
"""

import jax
import jax.numpy as jnp


def main():
    x = jnp.zeros((4, 16, 16, 16))
    parts = jnp.split(x, 2, axis=0)  # tf.split(value, num_or_size_splits)
    print("split:", [p.shape for p in parts])

    logits = jnp.zeros((4, 16, 16, 2))
    probs = jax.nn.softmax(logits, axis=-1)  # slim.softmax
    print("softmax:", probs.shape, "sums to", float(probs[0, 0, 0].sum()))

    pairs = jnp.zeros((4, 16, 16, 16)).reshape(4, 16, 16, 8, 2)
    link_probs = jax.nn.softmax(pairs, axis=-1)[..., 1]
    print("per-pair link softmax:", link_probs.shape)


if __name__ == "__main__":
    main()
