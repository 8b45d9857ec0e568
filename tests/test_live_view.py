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


class TestClickToGoal:
    def test_goal_post_roundtrip(self):
        """POST /goal (the 3D-Nav-Goal channel) must update the scene
        marker, fire the on_goal callback, and surface through
        poll_goal exactly once."""
        import json
        import urllib.request

        from isdf_tpu.viz.live_view import LiveFlightView

        got = []
        view = LiveFlightView(quiet=True, on_goal=lambda g: got.append(g))
        try:
            req = urllib.request.Request(
                view.url + "goal", data=json.dumps([1.5, -2.0, 3.25]).encode(),
                method="POST")
            assert urllib.request.urlopen(req).status == 204
            g = view.poll_goal()
            assert g is not None and np.allclose(g, [1.5, -2.0, 3.25])
            assert view.poll_goal() is None          # cleared after read
            assert len(got) == 1 and np.allclose(got[0], [1.5, -2.0, 3.25])
            scene = json.loads(urllib.request.urlopen(
                view.url + "scene.json").read())
            assert scene["goal"] == [1.5, -2.0, 3.25]
            # malformed goal → 400, server stays alive
            bad = urllib.request.Request(
                view.url + "goal", data=b"nope", method="POST")
            try:
                urllib.request.urlopen(bad)
                assert False, "expected 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
            assert urllib.request.urlopen(view.url).status == 200
        finally:
            view.close()
