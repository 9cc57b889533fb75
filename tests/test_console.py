"""Console color helpers + heatmap colorization (reference
imaginaire/utils/termcolor.py + visualization.get_heatmap parity)."""

import numpy as np

from mlinerf_tpu.utils import console


def test_colors_noop_when_not_tty(capsys):
    # pytest captures stdout (not a tty) -> raw text, no ANSI escapes.
    assert console.red("x") == "x"
    assert console.green(42) == "42"
    console.alert("boom", color="yellow")
    out = capsys.readouterr().out
    assert "* boom" in out and "\033[" not in out


def test_pp_dict_format():
    s = console.PP({"a": 1, "b": [1, 2]})
    assert s.startswith("{") and "'a': 1" in s


def test_heatmap_shapes_and_range():
    g = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)
    h = console.get_heatmap(g)
    assert h.shape == (8, 8, 3)
    assert h.min() >= 0.0 and h.max() <= 1.0
    # Monotone colormap endpoints: dark violet at 0, yellow at 1.
    assert h[0, 0, 2] > h[-1, -1, 2]  # blue drops
    assert h[-1, -1, 0] > h[0, 0, 0]  # red rises
    gray = console.get_heatmap(g, cmap="gray")
    np.testing.assert_allclose(gray[..., 0], g)


def test_preprocess_image_single_channel_colorized():
    img = np.random.RandomState(0).rand(4, 4, 1).astype(np.float32)
    out = console.preprocess_image(img, from_range=(0, 1), cmap="viridis")
    assert out.shape == (4, 4, 3)
    rgb = np.random.RandomState(0).rand(4, 4, 3).astype(np.float32)
    np.testing.assert_allclose(console.preprocess_image(rgb), rgb, atol=1e-6)
