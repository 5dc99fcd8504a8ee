"""Interactive helpers (rebuild of ``src/toast/interactive/``).

Jupyter widgets from the reference require ipywidgets; here we provide the
embeddable pieces that work in any IPython session and gate the widget
classes on availability.
"""


def embed():  # pragma: no cover - interactive only
    """Drop into an IPython shell with toast_tpu imported."""
    import IPython

    import toast_tpu

    IPython.embed(user_ns={"toast_tpu": toast_tpu})


def widgets_available():
    import importlib.util

    return importlib.util.find_spec("ipywidgets") is not None


class ObservationWidget:  # pragma: no cover - interactive only
    """Summary widget for an Observation (requires ipywidgets)."""

    def __init__(self, ob):
        if not widgets_available():
            raise RuntimeError("ipywidgets is not available")
        self.ob = ob

    def _ipython_display_(self):
        import ipywidgets as w
        from IPython.display import display

        rows = [
            f"name: {self.ob.name}",
            f"detectors: {len(self.ob.all_detectors)}",
            f"samples: {self.ob.n_local_samples}",
            f"detdata: {list(self.ob.detdata.keys())}",
            f"shared: {list(self.ob.shared.keys())}",
            f"intervals: {list(self.ob.intervals.keys())}",
        ]
        display(w.VBox([w.Label(r) for r in rows]))
