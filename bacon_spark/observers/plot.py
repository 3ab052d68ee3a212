"""Plot sink: 1-D time series -> matplotlib figure
(reference TimePlotData, /root/reference/bacon/observers/plot.py:33-70).

matplotlib is not in this container, so the data-preparation layer (which
is the engine's responsibility: collect the small aggregated slice, order
it, split into series) is real and tested, while figure rendering is gated
behind the import.
"""

from __future__ import annotations

from ..cubequery import CubeQuery
from ..engine import CuttingBoard


class TimePlotData:
    """Prepared plot data: x = first axis values (expected: a date-family
    label), one y-series per visible measure."""

    def __init__(self, board: CuttingBoard, query: CubeQuery):
        if len(query.axes) != 1:
            raise ValueError("TimePlotData requires exactly one axis")
        self.board = board
        self.query = query
        rows = board.slice(query).rows()
        axis = query.axes[0]
        self.x = [r[axis] for r in rows]
        self.series = {
            v: [r[v] for r in rows] for v in query.visible_values
        }
        self.x_title = board.cubedef.get_label(axis).title
        self.titles = {v: board.cubedef.get_value(v).title for v in self.series}

    def render(self, figsize=(10, 6)):
        """Render to a matplotlib figure (requires matplotlib)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError as e:  # pragma: no cover - lib absent in container
            raise NotImplementedError(
                "matplotlib is not installed; use .x/.series for the data"
            ) from e
        fig, ax = plt.subplots(figsize=figsize)
        for name, ys in self.series.items():
            ax.plot(self.x, ys, label=self.titles[name])
        ax.set_xlabel(self.x_title)
        ax.legend()
        fig.autofmt_xdate()
        return fig


def render_excel(table):  # pragma: no cover - lib absent in container
    """Excel sink (reference /root/reference/bacon/observers/excel.py:12-133).
    Driver-side presentation; openpyxl/xlwt not in this container."""
    raise NotImplementedError(
        "openpyxl/xlwt not installed; render via render_csv or render_table_json"
    )
