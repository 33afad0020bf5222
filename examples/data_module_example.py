"""Example --data_module for the DL4DS-TPU CLI.

The CLI imports this file at runtime; it must expose the module-level
variables below (same contract as the reference, dl4ds/app.py:177-186).
Replace the synthetic data with your own loading/scaling code.
"""

import numpy as np

rng = np.random.default_rng(0)
_t = np.arange(512)
_yy, _xx = np.meshgrid(np.arange(128), np.arange(128), indexing='ij')
_all = np.stack([(np.sin(0.2 * _yy + 0.03 * k) * np.cos(0.25 * _xx - 0.02 * k)
                  + 0.1 * rng.standard_normal((128, 128)))
                 for k in _t])[..., None].astype('float32')

data_train = _all[:384]
data_val = _all[384:448]
data_test = _all[448:]
data_train_lr = data_val_lr = data_test_lr = None

predictors_train = predictors_val = predictors_test = None
static_vars = None

inference_data = _all[448:]
inference_scaler = None
inference_predictors = None
gt_holdout_dataset = _all[448:]
gt_mask = np.ones((128, 128), 'float32')
