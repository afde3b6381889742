"""IPython / notebook progress-bar glue.

Reference parity: ``src/qinfer/ipy.py::IPythonProgressBar`` (SURVEY.md §2
#23) — the ``start(max) / update(n) / finished()`` protocol consumed by
:mod:`qinfer_tpu.perf_testing`. Falls back to a plain text bar outside
notebooks (ipywidgets optional).
"""

from __future__ import annotations

import sys

__all__ = ["IPythonProgressBar", "TextProgressBar"]


class TextProgressBar:
    """Minimal stderr progress bar implementing the reference protocol."""

    def __init__(self, stream=None):
        self.stream = stream or sys.stderr
        self.max = None
        self.n = 0

    def start(self, max=100):
        self.max = max
        self.n = 0

    def update(self, n=None):
        self.n = self.n + 1 if n is None else n
        if self.max:
            frac = self.n / self.max
            self.stream.write(f"\r[{int(50*frac)*'#':<50}] {self.n}/{self.max}")
            self.stream.flush()

    def finished(self):
        self.stream.write("\n")
        self.stream.flush()


class IPythonProgressBar:
    """ipywidgets-backed progress bar with the reference's
    ``start``/``update``/``finished`` protocol; degrades to
    :class:`TextProgressBar` when ipywidgets is unavailable.

    Reference parity: ``src/qinfer/ipy.py::IPythonProgressBar``.
    """

    def __init__(self):
        try:
            import ipywidgets
            from IPython.display import display

            self.widget = ipywidgets.FloatProgress(
                value=0.0, min=0.0, max=100.0)
            self._display = display
            self._fallback = None
        except Exception:
            self.widget = None
            self._fallback = TextProgressBar()

    @property
    def description(self):
        if self.widget is not None:
            return self.widget.description
        return ""

    @description.setter
    def description(self, value):
        if self.widget is not None:
            self.widget.description = value

    def start(self, max=100):
        if self.widget is not None:
            self.widget.max = max
            self._display(self.widget)
        else:
            self._fallback.start(max)

    def update(self, n=None):
        if self.widget is not None:
            self.widget.value = n if n is not None else self.widget.value + 1
        else:
            self._fallback.update(n)

    def finished(self):
        if self.widget is not None:
            self.widget.bar_style = "success"
        else:
            self._fallback.finished()
