"""REINFORCE-style solver.

The reference registers this solver but its body is an unfinished stub
(``betty/hypergradient/reinforce.py:6-25`` — the function ends after reading
the config). We register it for API parity and fail loudly instead of
silently returning ``None``.
"""


def reinforce(vector, curr, prev, ctx, states, curr_batch, rng):
    raise NotImplementedError(
        "The 'reinforce' hypergradient solver is a stub in the reference "
        "library and is not implemented here either."
    )
