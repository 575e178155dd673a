"""Weight-compatibility proof: Keras MobileNetV2 weights load into the
Flax backbone and produce numerically matching activations — meaning every
public MobileNetV2/SSD checkpoint can be carried over (SURVEY.md §7
hard-part 5)."""

import numpy as np
import pytest

# timed >30 s on the 1-core CI host (big CPU compiles / TF rigs);
# excluded from `make test-fast`
pytestmark = pytest.mark.slow


tf = pytest.importorskip('tensorflow')

import jax.numpy as jnp

from watsor_tpu.models.convert import (backbone_variables_from_keras,
                                       load_keras_mobilenet_v2)
from watsor_tpu.models.mobilenet_v2 import MobileNetV2Backbone


@pytest.fixture(scope='module')
def keras_model():
    tf.random.set_seed(0)
    return load_keras_mobilenet_v2(width_multiplier=1.0, weights=None,
                                   input_size=96)


def test_converted_backbone_matches_keras_output(keras_model):
    variables = backbone_variables_from_keras(keras_model)
    backbone = MobileNetV2Backbone(width_multiplier=1.0, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (1, 96, 96, 3)).astype(np.float32)

    keras_out = np.asarray(keras_model(x, training=False))
    _, c5 = backbone.apply(variables, jnp.asarray(x), train=False)
    flax_out = np.asarray(c5)

    assert flax_out.shape == keras_out.shape
    # identical weights + identical architecture => near-identical output
    diff = np.abs(flax_out - keras_out)
    scale = np.abs(keras_out).max() or 1.0
    assert diff.max() / scale < 5e-4, \
        'max rel diff {:.2e}'.format(diff.max() / scale)


def test_c4_tap_shape(keras_model):
    variables = backbone_variables_from_keras(keras_model)
    backbone = MobileNetV2Backbone(width_multiplier=1.0, dtype=jnp.float32)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    c4, c5 = backbone.apply(variables, x, train=False)
    # C4 = block-13 expansion at stride 16 (576 ch), C5 = 1280 at stride 32
    assert c4.shape == (1, 6, 6, 576)
    assert c5.shape == (1, 3, 3, 1280)
