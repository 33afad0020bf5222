"""Continuous parity vs the ACTUAL TF reference.

Runs tools/tf_parity.py's golden sections in-process when TensorFlow and
the reference checkout are available (they are in this CI image), so the
data-prep and weight-transplant parity claims are verified on every suite
run — not only in the committed PARITY_TF.json artifact. Skipped cleanly
where TF or /root/reference is absent. The heavier train/throughput
sections stay artifact-only (tools/tf_parity.py)."""

import os
import sys

import numpy as np
import pytest

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tools')

# must be set BEFORE TensorFlow first imports: legacy Keras for the
# reference's LocallyConnected2D etc., and oneDNN off (its f32 reorder
# alone contributes ~3e-4 output delta on the transplant test)
os.environ.setdefault('TF_USE_LEGACY_KERAS', '1')
os.environ.setdefault('TF_ENABLE_ONEDNN_OPTS', '0')
os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '2')

tf = pytest.importorskip('tensorflow')
if not os.path.isdir('/root/reference/dl4ds'):
    pytest.skip('reference checkout not available', allow_module_level=True)


@pytest.fixture(scope='module')
def ref():
    if _TOOLS not in sys.path:
        sys.path.insert(0, _TOOLS)
    import tf_parity
    return tf_parity._import_reference()


def test_dataprep_golden_vs_reference(ref):
    import tf_parity
    res = tf_parity.section_dataprep(ref)
    assert res['max_abs_delta'] <= 1e-5, res
    assert res['n_cases'] >= 16


def test_weight_transplant_forward_parity(ref):
    import tf_parity
    res = tf_parity.section_transplant(ref)
    assert res['pass_1e-5'], res
    for fam in ('convnet_pin', 'resnet_spc_4x', 'recresnet_pin_tw3',
                'unet_pin_spc'):
        assert res['models'][fam]['output_rmse'] <= 1e-5
    for fam in ('resnet_spc_4x', 'recresnet_pin_tw3', 'unet_pin_spc'):
        assert res['models'][fam]['param_count_equal']


def test_discriminator_param_counts(ref):
    import tf_parity
    res = tf_parity.section_discriminator(ref)
    assert res['max_param_count_delta'] == 0, res
