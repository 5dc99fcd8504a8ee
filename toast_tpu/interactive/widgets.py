"""Jupyter widgets for interactive data exploration.

Rebuild of ``ref:src/toast/widgets.py`` (``ObservationWidget:21``): a
tabbed view of one Observation with metadata / instrument tables, a
detector + time-range selector, and on-demand detdata plotting.  The
widget tree is built eagerly (testable headless); plots render through
the Agg backend into an ipywidgets Image.
"""

from __future__ import annotations

import io

import numpy as np


def _html_table(rows, header=None):
    import html

    out = ["<table style='border-collapse:collapse'>"]
    if header:
        out.append(
            "<tr>"
            + "".join(
                f"<th style='border:1px solid #999;padding:2px 6px'>{html.escape(str(h))}</th>"
                for h in header
            )
            + "</tr>"
        )
    for row in rows:
        out.append(
            "<tr>"
            + "".join(
                f"<td style='border:1px solid #999;padding:2px 6px'>{html.escape(str(c))}</td>"
                for c in row
            )
            + "</tr>"
        )
    out.append("</table>")
    return "".join(out)


class ObservationWidget:
    """Tabbed Observation explorer (reference ``widgets.py:21``)."""

    def __init__(self, obs):
        import ipywidgets as w

        self.obs = obs
        self._w = w
        self.tabs = w.Tab(
            children=[
                self._meta_tab(),
                self._instrument_tab(),
                self._data_tab(),
            ]
        )
        for i, title in enumerate(("Metadata", "Instrument", "Detector Data")):
            self.tabs.set_title(i, title)

    # -- tabs ----------------------------------------------------------------
    def _meta_tab(self):
        w = self._w
        ob = self.obs
        rows = [
            ("name", ob.name),
            ("UID", ob.uid),
            ("samples", ob.n_local_samples),
            ("detectors", len(ob.all_detectors)),
            ("session", getattr(ob.session, "name", None)),
            ("telescope", ob.telescope.name),
        ]
        for k, v in ob.items():
            if isinstance(v, (str, int, float, bool)):
                rows.append((k, v))
        meta = w.HTML(_html_table(rows, header=("key", "value")))
        ivl_rows = [
            (name, len(ob.intervals[name])) for name in ob.intervals
        ]
        ivl = w.HTML(
            _html_table(ivl_rows, header=("interval list", "spans"))
            if ivl_rows
            else "<i>no interval lists</i>"
        )
        return w.VBox([meta, ivl])

    def _instrument_tab(self):
        w = self._w
        fp = self.obs.telescope.focalplane
        cols = [c for c in ("name", "pol_ang", "gamma", "psd_net") if c in fp.detector_data]
        rows = []
        for i, d in enumerate(self.obs.all_detectors[:64]):
            row = [d]
            for c in cols[1:]:
                val = fp.detector_data[c][i]
                row.append(f"{float(val):.4g}" if np.isscalar(val) else val)
            rows.append(row)
        return w.VBox(
            [
                w.HTML(f"<b>Site:</b> {self.obs.telescope.site.name}"),
                w.HTML(_html_table(rows, header=cols)),
            ]
        )

    def _data_tab(self):
        w = self._w
        ob = self.obs
        self.det_select = w.SelectMultiple(
            options=list(ob.all_detectors),
            value=tuple(ob.all_detectors[:1]),
            description="dets",
            rows=min(8, len(ob.all_detectors)),
        )
        n = ob.n_local_samples
        self.time_select = w.IntRangeSlider(
            value=(0, min(n, 10000)),
            min=0,
            max=n,
            description="samples",
            continuous_update=False,
        )
        self.field_select = w.Dropdown(
            options=list(ob.detdata.keys()) or ["<none>"],
            description="field",
        )
        self.plot_button = w.Button(description="Plot")
        self.image = w.Image(format="png")
        self.plot_button.on_click(lambda b: self.render_plot())
        return w.VBox(
            [
                w.HBox([self.field_select, self.plot_button]),
                self.det_select,
                self.time_select,
                self.image,
            ]
        )

    # -- actions ---------------------------------------------------------
    def render_plot(self):
        """Render the selected detdata span into the image widget."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        field = self.field_select.value
        if field not in self.obs.detdata:
            return None
        lo, hi = self.time_select.value
        data = self.obs.detdata[field]
        fig, ax = plt.subplots(figsize=(9, 4))
        for d in self.det_select.value:
            idx = data.index(d)
            vals = np.asarray(data.data[idx, lo:hi])
            if vals.ndim > 1:
                vals = vals.reshape(vals.shape[0], -1)[:, 0]
            ax.plot(np.arange(lo, hi), vals, lw=0.6, label=d)
        ax.set_xlabel("sample")
        ax.set_ylabel(f"{field} [{data.units}]")
        ax.legend(fontsize=7)
        fig.tight_layout()
        buf = io.BytesIO()
        fig.savefig(buf, format="png", dpi=100)
        plt.close(fig)
        self.image.value = buf.getvalue()
        return self.image.value

    def _ipython_display_(self):
        from IPython.display import display

        display(self.tabs)
