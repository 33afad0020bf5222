"""Interactive + projected visualization (the ecubevis counterpart,
reference: dl4ds/dataloader.py:260-289 and metrics.py:202-218 render
through `ecubevis`; dl4ds_tpu renders through `viz.py` with no extra
dependencies)."""

import os

import numpy as np
import pytest

from dl4ds_tpu.viz import interactive_panel, plot_projected


@pytest.mark.smoke
def test_interactive_panel_self_contained_html(tmp_path, rng):
    data = rng.standard_normal((3, 12, 16, 2)).astype('float32')
    lats = np.linspace(50, 40, 12)
    lons = np.linspace(0, 15, 16)
    path = interactive_panel(data, lats=lats, lons=lons,
                             save_path=str(tmp_path / 'p.html'))
    html = open(path).read()
    # self-contained: canvas + embedded quantized data + coords + palette
    assert '<canvas' in html and 'atob(' in html
    assert 'http://' not in html and 'https://' not in html
    assert f'T={data.shape[0]}, H={data.shape[1]}, W={data.shape[2]}' in html
    assert '50.0' in html and '15.0' in html          # lat/lon embedded
    # exact range recorded (display quantization error <= range/65535)
    assert f'{float(data.min()):.4g}' in html
    assert f'{float(data.max()):.4g}' in html
    # payload size: T*H*W*C uint16 values, base64 (4/3 expansion)
    n = data.size * 2
    assert len(html) > n * 4 // 3


def test_interactive_panel_shapes_and_validation(tmp_path, rng):
    # 2-D and 3-D inputs are promoted
    p2 = interactive_panel(rng.standard_normal((8, 8)),
                           save_path=str(tmp_path / 'a.html'))
    assert 'T=1, H=8, W=8, C=1' in open(p2).read()
    with pytest.raises(ValueError, match=r'\[H,W\]'):
        interactive_panel(rng.standard_normal((2, 2, 2, 2, 2)))
    with pytest.raises(ValueError, match='length H'):
        interactive_panel(rng.standard_normal((4, 4)), lats=np.arange(3),
                          save_path=str(tmp_path / 'b.html'))
    with pytest.raises(ValueError, match='finite'):
        interactive_panel(np.full((4, 4), np.nan),
                          save_path=str(tmp_path / 'c.html'))


def test_interactive_panel_nan_tolerant(tmp_path, rng):
    data = rng.standard_normal((4, 4)).astype('float32')
    data[0, 0] = np.nan
    path = interactive_panel(data, save_path=str(tmp_path / 'n.html'))
    assert 'NaN' not in open(path).read().split('<script>')[1][:200]


def test_plot_projected_geographic(tmp_path, rng):
    data = rng.standard_normal((10, 20)).astype('float32')
    lats = np.linspace(80, -80, 10)
    lons = np.linspace(0, 342, 20)         # 0..360 convention: must wrap
    out = plot_projected(data, lats, lons, projection='mollweide',
                         save_fname=str(tmp_path / 'm.png'))
    import os
    assert os.path.getsize(out) > 5000
    # panel mode + a second projection
    out2 = plot_projected(rng.standard_normal((2, 10, 20)), lats, lons,
                          projection='hammer',
                          save_fname=str(tmp_path / 'h.png'))
    assert os.path.getsize(out2) > 5000
    with pytest.raises(ValueError, match='match the field'):
        plot_projected(data, lats[:-1], lons)


@pytest.mark.smoke
def test_plot_ndarray_interactive_routes_to_viewer(tmp_path, rng):
    """utils.plot_ndarray(interactive=True) — the reference's ecubevis
    interactive mode — writes the self-contained HTML viewer."""
    from dl4ds_tpu.utils import plot_ndarray
    out = plot_ndarray(rng.standard_normal((2, 8, 8)), interactive=True,
                       save_fname=str(tmp_path / 'v.html'),
                       lats=np.linspace(10, 0, 8), lons=np.arange(8.0))
    html = open(out).read()
    assert '<canvas' in html and 'T=2, H=8, W=8' in html


def test_plot_projected_cartopy_fallback_warns(tmp_path, rng):
    """cartopy is optional: a cartopy-only projection name must fall back
    to matplotlib's geo axes with a warning, never ImportError."""
    import warnings
    from dl4ds_tpu.viz import plot_projected, _cartopy_projection
    a = rng.standard_normal((6, 8)).astype('float32')
    lats = np.linspace(-60, 60, 6)
    lons = np.linspace(0, 350, 8)
    out = str(tmp_path / 'proj.png')
    if _cartopy_projection('robinson') is None:   # cartopy absent
        with pytest.warns(RuntimeWarning, match='cartopy'):
            plot_projected(a, lats, lons, projection='robinson',
                           save_fname=out)
    else:
        plot_projected(a, lats, lons, projection='robinson',
                       save_fname=out)
    assert os.path.getsize(out) > 1000
    # matplotlib-native names never warn
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        plot_projected(a, lats, lons, projection='mollweide',
                       save_fname=str(tmp_path / 'moll.png'))


def test_compute_metrics_projected_artifacts(tmp_path, rng):
    """compute_metrics(projection=) writes a *_projected.png companion for
    every metric map (the reference's ecubevis projected panels role)."""
    from dl4ds_tpu.metrics import compute_metrics
    y = rng.standard_normal((6, 12, 16, 1)).astype('float32') + 5
    yh = y + 0.1 * rng.standard_normal(y.shape).astype('float32')
    sp = str(tmp_path) + '/'
    compute_metrics(y, yh, save_path=sp,
                    lats=np.linspace(-30, 30, 12),
                    lons=np.linspace(10, 55, 16), projection='mollweide')
    for f in ('metrics_pergridpoint_rmse_map', 'metrics_nmeanbias_map',
              'metrics_pergridpoint_corrpears_map'):
        assert os.path.getsize(os.path.join(sp, f + '_projected.png')) \
            > 1000, f
