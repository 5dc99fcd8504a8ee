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


def __getattr__(name):
    if name == "ObservationWidget":
        from .widgets import ObservationWidget

        return ObservationWidget
    raise AttributeError(name)
