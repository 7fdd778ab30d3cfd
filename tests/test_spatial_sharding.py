"""Depth-sharded whole-volume forward == replicated forward (8-dev mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrcnn3d.models.resnet3d import ResNet3D
from mrcnn3d.parallel.mesh import make_mesh
from mrcnn3d.parallel.spatial import spatial_extract_feat


class _Wrapper:
    """Duck-typed model exposing extract_feat for the sharding helper."""

    def __init__(self, module):
        self.module = module

    def apply(self, variables, x, method=None):
        return self.module.apply(variables, x)

    @property
    def extract_feat(self):
        return None


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)
def test_depth_sharded_backbone_matches_replicated():
    mesh = make_mesh(8)
    m = ResNet3D(depth=18, base_width=8)
    x = jnp.asarray(
        np.random.RandomState(0).randn(1, 32, 32, 32, 3), jnp.float32
    )
    variables = m.init(jax.random.PRNGKey(0), x[:, :8, :16, :16, :])

    ref = m.apply(variables, x)
    fn = spatial_extract_feat(_Wrapper(m), variables, mesh)
    sharded = fn(x)
    assert len(sharded) == len(ref)
    for a, b in zip(sharded, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        )
