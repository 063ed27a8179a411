"""Mesh helpers for 1-D (and later N-D) device meshes."""

import jax

AXIS = 'shard'


def make_mesh(n_devices=None, axis=AXIS):
    """1-D mesh over the first n_devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, \
            "need %d devices, have %d" % (n_devices, len(devices))
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (axis,), devices=devices)
