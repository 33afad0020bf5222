"""Pixel-shuffle primitives (NHWC).

The reference relies on tf.nn.depth_to_space for its sub-pixel convolution
head (dl4ds/models/blocks.py:418-427). XLA has no single primitive for it;
the canonical reshape/transpose formulation below compiles to a pure layout
change that XLA fuses with the producing convolution.
"""


__all__ = ['depth_to_space', 'space_to_depth']


def depth_to_space(x, block_size):
    """[..., H, W, C*r^2] -> [..., H*r, W*r, C] (NHWC, r = block_size)."""
    r = block_size
    *lead, h, w, c = x.shape
    if c % (r * r) != 0:
        raise ValueError(f'channels {c} not divisible by block_size^2 {r * r}')
    c_out = c // (r * r)
    x = x.reshape(*lead, h, w, r, r, c_out)
    # interleave the r-blocks into the spatial dims
    n = len(lead)
    perm = list(range(n)) + [n, n + 2, n + 1, n + 3, n + 4]
    x = x.transpose(perm)
    return x.reshape(*lead, h * r, w * r, c_out)


def space_to_depth(x, block_size):
    """[..., H*r, W*r, C] -> [..., H, W, C*r^2] (inverse of depth_to_space)."""
    r = block_size
    *lead, h, w, c = x.shape
    if h % r or w % r:
        raise ValueError(f'spatial dims ({h},{w}) not divisible by {r}')
    x = x.reshape(*lead, h // r, r, w // r, r, c)
    n = len(lead)
    perm = list(range(n)) + [n, n + 2, n + 1, n + 3, n + 4]
    x = x.transpose(perm)
    return x.reshape(*lead, h // r, w // r, c * r * r)
