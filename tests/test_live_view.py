"""Live in-flight viewer (viz/live_view.py — the odom_visualization/rviz
equivalent, VERDICT r3 missing #5): serve, stream states, fetch over HTTP
like the browser would."""

import json
import urllib.request

import numpy as np
import pytest

from isdf_tpu.viz.live_view import LiveFlightView

pytestmark = pytest.mark.smoke


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.read()


class TestLiveFlightView:
    def test_serves_page_scene_and_state(self):
        view = LiveFlightView(quiet=True)
        try:
            rng = np.random.default_rng(0)
            pts = rng.uniform(0, 8, size=(500, 3))
            view.set_scene(points=pts, goal=[7.0, 4.0, 1.0])
            view.set_plan(np.linspace([0, 0, 0], [7, 4, 1], 32))
            for k in range(5):
                view.update(0.1 * k, [0.1 * k, 0.05 * k, 0.5],
                            speed=1.0 + k, min_body_sdf=0.4)

            page = _get(view.url).decode()
            assert "isdf_tpu live flight" in page and "state.json" in page

            scene = json.loads(_get(view.url + "scene.json"))
            assert len(scene["points"]) == 500
            assert scene["goal"] == [7.0, 4.0, 1.0]

            state = json.loads(_get(view.url + "state.json"))
            assert len(state["trail"]) == 5
            assert len(state["plan"]) == 32
            assert state["metrics"]["speed"] == 5.0
            assert state["metrics"]["min_body_sdf"] == pytest.approx(0.4)
        finally:
            view.close()

    def test_trail_truncation_and_downsample(self):
        view = LiveFlightView(quiet=True, trail_len=10,
                              max_scene_points=100)
        try:
            view.set_scene(points=np.zeros((5000, 3)))
            for k in range(50):
                view.update(k * 0.01, [k, 0, 0])
            scene = json.loads(_get(view.url + "scene.json"))
            state = json.loads(_get(view.url + "state.json"))
            assert len(scene["points"]) == 100
            assert len(state["trail"]) == 10
            assert state["trail"][-1][0] == 49.0
        finally:
            view.close()
