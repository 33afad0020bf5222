"""CLI app end-to-end test: --flagfile + --data_module contract + --debug
run through train -> test -> metrics (the reference's de-facto smoke test,
dl4ds/app.py:41 + :101-106)."""

import os
import subprocess
import sys
import textwrap

import numpy as np


def test_app_debug_run(tmp_path):
    data_file = tmp_path / 'data_module.py'
    data_file.write_text(textwrap.dedent("""
        import numpy as np
        rng = np.random.default_rng(0)
        _all = rng.standard_normal((60, 16, 16, 1)).astype('float32')
        data_train = _all[:40]
        data_val = _all[40:50]
        data_test = _all[50:]
        data_train_lr = data_val_lr = data_test_lr = None
        predictors_train = predictors_val = predictors_test = None
        static_vars = None
        inference_data = _all[50:]
        inference_scaler = None
        inference_predictors = None
        gt_holdout_dataset = _all[50:]
        gt_mask = np.ones((16, 16))
    """))
    save_path = str(tmp_path / 'results') + '/'
    os.makedirs(save_path, exist_ok=True)
    cfg = tmp_path / 'params.cfg'
    cfg.write_text(textwrap.dedent(f"""
        --debug
        --device=CPU
        --data_module={data_file}
        --backbone=convnet
        --upsampling=pin
        --scale=4
        --batch_size=2
        --n_filters=4
        --n_blocks=1
        --dropout_rate=0.1
        --dropout_variant=mcdrop
        --inference_mc_members=3
        --gradient_accumulation_steps=2
        --lr_schedule=warmup_cosine
        --warmup_steps=2
        --ema_decay=0.9
        --save_path={save_path}
        --inference_array_in_hr
        --inference_save_fname=y_hat.npy
        --noshow_plot
    """))
    env = dict(os.environ,
               XLA_FLAGS='--xla_force_host_platform_device_count=8',
               JAX_PLATFORMS='cpu')
    res = subprocess.run(
        [sys.executable, '-m', 'dl4ds_tpu.app', f'--flagfile={cfg}'],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr[-3000:]
    assert os.path.exists(save_path + 'y_hat.npy')
    assert os.path.exists(save_path + 'test_loss.txt')
    assert os.path.exists(save_path + 'metrics_summary.txt')
    y_hat = np.load(save_path + 'y_hat.npy')
    assert y_hat.shape == (10, 16, 16, 1)
    # MC-dropout ensemble + probabilistic verification artifacts
    mc_std = np.load(save_path + 'y_hat_mc_std.npy')
    assert mc_std.shape == y_hat.shape and float(mc_std.max()) > 0
    assert os.path.exists(save_path + 'metrics_crps_map.npy')
    assert os.path.exists(save_path + 'metrics_rank_histogram.npy')
    assert os.path.exists(save_path + 'metrics_prob_summary.txt')


def test_app_saved_model_eval(tmp_path):
    """Two invocations: train+save, then --notrain --trained_model_path
    runs the test/metrics phases on the saved model (beyond the reference
    app, which can only evaluate the model it just trained)."""
    data_file = tmp_path / 'data_module.py'
    data_file.write_text(textwrap.dedent("""
        import numpy as np
        rng = np.random.default_rng(0)
        _all = rng.standard_normal((60, 16, 16, 1)).astype('float32')
        data_train = _all[:40]
        data_val = _all[40:50]
        data_test = _all[50:]
        data_train_lr = data_val_lr = data_test_lr = None
        predictors_train = predictors_val = predictors_test = None
        static_vars = None
        inference_data = _all[50:]
        inference_scaler = None
        inference_predictors = None
        gt_holdout_dataset = _all[50:]
        gt_mask = None
    """))
    save_path = str(tmp_path / 'results') + '/'
    os.makedirs(save_path, exist_ok=True)
    common = textwrap.dedent(f"""
        --debug
        --device=CPU
        --data_module={data_file}
        --backbone=convnet
        --upsampling=pin
        --scale=4
        --batch_size=2
        --n_filters=4
        --n_blocks=1
        --dropout_rate=0
        --save_path={save_path}
        --inference_array_in_hr
        --noshow_plot
    """)
    env = dict(os.environ,
               XLA_FLAGS='--xla_force_host_platform_device_count=8',
               JAX_PLATFORMS='cpu')
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # phase 1: train + save, no eval
    cfg1 = tmp_path / 'train.cfg'
    cfg1.write_text(common + '--notest\n--nometrics\n--save\n')
    res = subprocess.run(
        [sys.executable, '-m', 'dl4ds_tpu.app', f'--flagfile={cfg1}'],
        capture_output=True, text=True, timeout=600, env=env, cwd=root)
    assert res.returncode == 0, res.stderr[-3000:]
    model_dir = save_path + 'convnet_pin/'
    assert os.path.exists(model_dir + 'model_config.json')
    # phase 2: evaluate the saved model in a FRESH process
    cfg2 = tmp_path / 'eval.cfg'
    cfg2.write_text(common + '--notrain\n--test\n--metrics\n'
                    f'--trained_model_path={model_dir}\n'
                    '--inference_save_fname=y_hat_eval.npy\n')
    res = subprocess.run(
        [sys.executable, '-m', 'dl4ds_tpu.app', f'--flagfile={cfg2}'],
        capture_output=True, text=True, timeout=600, env=env, cwd=root)
    assert res.returncode == 0, res.stderr[-3000:]
    y_hat = np.load(save_path + 'y_hat_eval.npy')
    assert y_hat.shape == (10, 16, 16, 1)
    assert os.path.exists(save_path + 'metrics_summary.txt')


def test_app_cgan_debug_run(tmp_path):
    data_file = tmp_path / 'data_module.py'
    data_file.write_text(textwrap.dedent("""
        import numpy as np
        rng = np.random.default_rng(0)
        _all = rng.standard_normal((40, 16, 16, 1)).astype('float32')
        data_train = _all[:30]
        data_val = _all[30:36]
        data_test = _all[36:]
        data_train_lr = data_val_lr = data_test_lr = None
        predictors_train = predictors_val = predictors_test = None
        static_vars = None
        inference_data = _all[36:]
        inference_scaler = None
        inference_predictors = None
        gt_holdout_dataset = _all[36:]
        gt_mask = np.ones((16, 16))
    """))
    save_path = str(tmp_path / 'results') + '/'
    os.makedirs(save_path, exist_ok=True)
    cfg = tmp_path / 'params.cfg'
    cfg.write_text(textwrap.dedent(f"""
        --debug
        --device=CPU
        --trainer=CGANTrainer
        --data_module={data_file}
        --backbone=resnet
        --upsampling=spc
        --scale=4
        --batch_size=2
        --n_filters=4
        --n_blocks=1
        --n_disc_filters=4
        --n_disc_blocks=1
        --dropout_rate=0
        --checkpoints_frequency=0
        --save_path={save_path}
        --inference_save_fname=y_hat.npy
        --nometrics
        --noshow_plot
    """))
    env = dict(os.environ,
               XLA_FLAGS='--xla_force_host_platform_device_count=8',
               JAX_PLATFORMS='cpu')
    res = subprocess.run(
        [sys.executable, '-m', 'dl4ds_tpu.app', f'--flagfile={cfg}'],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr[-3000:]
    assert os.path.exists(save_path + 'y_hat.npy')
    assert os.path.exists(save_path + 'losses.npy')


def test_app_netcdf_export(tmp_path):
    """The test phase exports y_hat as netCDF when xarray is importable and
    gt_holdout_dataset carries time/lat/lon coords (reference app.py:280-287).
    Runs against the in-repo xarray stand-in via PYTHONPATH."""
    data_file = tmp_path / 'data_module.py'
    data_file.write_text(textwrap.dedent("""
        import numpy as np
        import xarray as xr
        rng = np.random.default_rng(0)
        _all = rng.standard_normal((60, 16, 16, 1)).astype('float32')
        data_train = _all[:40]
        data_val = _all[40:50]
        data_test = _all[50:]
        data_train_lr = data_val_lr = data_test_lr = None
        predictors_train = predictors_val = predictors_test = None
        static_vars = None
        inference_data = _all[50:]
        inference_scaler = None
        inference_predictors = None
        _times = np.arange('2001-01', '2001-11',
                           dtype='datetime64[M]').astype('datetime64[ns]')
        gt_holdout_dataset = xr.DataArray(
            _all[50:, :, :, 0], dims=('time', 'lat', 'lon'),
            coords={'time': _times, 'lat': np.arange(16.),
                    'lon': np.arange(16.)})
        gt_mask = np.ones((16, 16))
    """))
    save_path = str(tmp_path / 'results') + '/'
    os.makedirs(save_path, exist_ok=True)
    cfg = tmp_path / 'params.cfg'
    cfg.write_text(textwrap.dedent(f"""
        --debug
        --device=CPU
        --data_module={data_file}
        --backbone=convnet
        --upsampling=pin
        --scale=4
        --batch_size=2
        --n_filters=4
        --n_blocks=1
        --save_path={save_path}
        --inference_array_in_hr
        --inference_save_fname=y_hat.npy
        --noshow_plot
    """))
    stubs = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         '_stubs')
    try:
        import xarray
        need_stub = 'stub' in getattr(xarray, '__version__', '')
    except ImportError:
        need_stub = True
    extra_path = ((stubs + os.pathsep if need_stub else '')
                  + os.environ.get('PYTHONPATH', ''))
    env = dict(os.environ,
               XLA_FLAGS='--xla_force_host_platform_device_count=8',
               JAX_PLATFORMS='cpu', PYTHONPATH=extra_path)
    res = subprocess.run(
        [sys.executable, '-m', 'dl4ds_tpu.app', f'--flagfile={cfg}'],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr[-3000:]
    nc = save_path + 'y_hat.nc'
    assert os.path.exists(nc), res.stderr[-2000:]
    # metrics phase ran with georeferenced (lat/lon-extent) maps
    assert os.path.exists(save_path + 'metrics_pergridpoint_rmse_map.png')
    sys.path.insert(0, stubs)
    try:
        import xarray as xr_check
        da = xr_check.open_dataarray(nc)
        assert np.asarray(da).shape == (10, 16, 16)
        assert np.issubdtype(np.asarray(da.time.values).dtype,
                             np.datetime64)
    finally:
        sys.path.remove(stubs)


def test_app_export_artifact(tmp_path):
    """--export_artifact freezes the trained forward to a StableHLO
    serving-artifact dir usable by dl4ds_tpu.serve (beyond the reference
    app, whose SavedModel export needs TF-Serving downstream)."""
    data_file = tmp_path / 'data_module.py'
    data_file.write_text(textwrap.dedent("""
        import numpy as np
        rng = np.random.default_rng(0)
        _all = rng.standard_normal((60, 16, 16, 1)).astype('float32')
        data_train = _all[:40]
        data_val = _all[40:50]
        data_test = _all[50:]
        data_train_lr = data_val_lr = data_test_lr = None
        predictors_train = predictors_val = predictors_test = None
        static_vars = None
        inference_data = _all[50:]
        inference_scaler = None
        inference_predictors = None
        gt_holdout_dataset = _all[50:]
        gt_mask = None
    """))
    save_path = str(tmp_path / 'results') + '/'
    artifact = str(tmp_path / 'artifact')
    os.makedirs(save_path, exist_ok=True)
    cfg = tmp_path / 'params.cfg'
    cfg.write_text(textwrap.dedent(f"""
        --debug
        --device=CPU
        --data_module={data_file}
        --backbone=convnet
        --upsampling=pin
        --scale=4
        --batch_size=2
        --n_filters=4
        --n_blocks=1
        --dropout_rate=0.0
        --notest
        --nometrics
        --save_path={save_path}
        --export_artifact={artifact}
        --noshow_plot
    """))
    env = dict(os.environ,
               XLA_FLAGS='--xla_force_host_platform_device_count=8',
               JAX_PLATFORMS='cpu')
    res = subprocess.run(
        [sys.executable, '-m', 'dl4ds_tpu.app', f'--flagfile={cfg}'],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr[-3000:]
    assert 'Serving artifact written' in res.stdout
    assert os.path.exists(os.path.join(artifact, 'forward.jaxexport'))
    # the artifact actually serves
    from dl4ds_tpu.serve import ModelServer
    srv = ModelServer(artifact)
    y = srv.predict(np.zeros((2, 16, 16, 1), 'float32'))
    assert y.shape == (2, 16, 16, 1)
    assert np.isfinite(y).all()


def test_app_export_quantized_artifact(tmp_path):
    """--export_quantize=int8 freezes the calibrated int8 replay; the
    batch-pinned artifact serves padded/chunked requests and /health
    reports the mode."""
    data_file = tmp_path / 'data_module.py'
    data_file.write_text(textwrap.dedent("""
        import numpy as np
        rng = np.random.default_rng(0)
        _all = rng.standard_normal((60, 16, 16, 1)).astype('float32')
        data_train = _all[:40]
        data_val = _all[40:50]
        data_test = _all[50:]
        data_train_lr = data_val_lr = data_test_lr = None
        predictors_train = predictors_val = predictors_test = None
        static_vars = None
        inference_data = _all[50:]
        inference_scaler = None
        inference_predictors = None
        gt_holdout_dataset = _all[50:]
        gt_mask = None
    """))
    save_path = str(tmp_path / 'results') + '/'
    artifact = str(tmp_path / 'artifact')
    os.makedirs(save_path, exist_ok=True)
    cfg = tmp_path / 'params.cfg'
    cfg.write_text(textwrap.dedent(f"""
        --debug
        --device=CPU
        --data_module={data_file}
        --backbone=convnet
        --upsampling=pin
        --scale=4
        --batch_size=2
        --n_filters=4
        --n_blocks=1
        --dropout_rate=0.0
        --notest
        --nometrics
        --save_path={save_path}
        --export_artifact={artifact}
        --export_quantize=int8
        --export_batch=4
        --inference_array_in_hr
        --noshow_plot
    """))
    env = dict(os.environ,
               XLA_FLAGS='--xla_force_host_platform_device_count=8',
               JAX_PLATFORMS='cpu')
    res = subprocess.run(
        [sys.executable, '-m', 'dl4ds_tpu.app', f'--flagfile={cfg}'],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr[-3000:]
    assert 'int8, batch=4' in res.stdout
    from dl4ds_tpu.serve import ModelServer
    srv = ModelServer(artifact)
    assert srv.health()['quantize'] == 'int8'
    assert srv.batch == 4
    # request batch 6 != pinned 4 -> server pads/chunks transparently
    y = srv.predict(np.zeros((6, 16, 16, 1), 'float32'))
    assert y.shape == (6, 16, 16, 1)
    assert np.isfinite(y).all()


def test_app_init_keras_npz(tmp_path):
    """--init_keras_npz: the CLI fine-tunes from a reference-trained
    Keras checkpoint (migration path, docs/MIGRATION.md)."""
    import pytest
    os.environ.setdefault('TF_USE_LEGACY_KERAS', '1')
    os.environ.setdefault('TF_ENABLE_ONEDNN_OPTS', '0')
    os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '2')
    pytest.importorskip('tensorflow')
    if not os.path.isdir('/root/reference/dl4ds'):
        pytest.skip('reference checkout absent')
    import sys as _sys
    _tools = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tools')
    if _tools not in _sys.path:
        _sys.path.insert(0, _tools)
    from tf_parity import _import_reference
    from dl4ds_tpu.compat import save_weights_npz
    ref = _import_reference()
    tfm = ref.models.net_postupsampling(
        backbone_block='resnet', upsampling='spc', scale=4, n_channels=1,
        n_aux_channels=0, lr_size=(8, 8), n_filters=6, n_blocks=2)
    npz = str(tmp_path / 'ref_weights.npz')
    save_weights_npz(tfm, npz)

    data_file = tmp_path / 'data_module.py'
    data_file.write_text(textwrap.dedent("""
        import numpy as np
        rng = np.random.default_rng(0)
        _all = rng.standard_normal((60, 32, 32, 1)).astype('float32')
        data_train = _all[:40]
        data_val = _all[40:50]
        data_test = _all[50:]
        data_train_lr = data_val_lr = data_test_lr = None
        predictors_train = predictors_val = predictors_test = None
        static_vars = None
        inference_data = _all[50:]
        inference_scaler = None
        inference_predictors = None
        gt_holdout_dataset = _all[50:]
        gt_mask = None
    """))
    save_path = str(tmp_path / 'results') + '/'
    os.makedirs(save_path, exist_ok=True)
    cfg = tmp_path / 'params.cfg'
    cfg.write_text(textwrap.dedent(f"""
        --debug
        --device=CPU
        --data_module={data_file}
        --backbone=resnet
        --upsampling=spc
        --scale=4
        --batch_size=2
        --n_filters=6
        --n_blocks=2
        --init_keras_npz={npz}
        --save_path={save_path}
        --nometrics
        --noshow_plot
    """))
    env = dict(os.environ,
               XLA_FLAGS='--xla_force_host_platform_device_count=8',
               JAX_PLATFORMS='cpu')
    res = subprocess.run(
        [sys.executable, '-m', 'dl4ds_tpu.app', f'--flagfile={cfg}'],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr[-3000:]
    assert 'Initialized parameters from reference checkpoint' in res.stdout
