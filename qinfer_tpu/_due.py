"""Citation plumbing (duecredit stub).

Reference parity: ``src/qinfer/_due.py`` (SURVEY.md §2 #25) — a no-op
shim exposing ``due``, ``Doi``, ``BibTeX`` so citation annotations never
break imports when duecredit is absent (it is not installed here).
"""

__all__ = ["due", "Doi", "BibTeX"]


class _InactiveDueCreditCollector:
    """No-op collector matching the duecredit API surface."""

    def _donothing(self, *args, **kwargs):
        return None

    def dcite(self, *args, **kwargs):
        def decorator(func):
            return func

        return decorator

    cite = load = add = _donothing

    def __repr__(self):
        return f"{self.__class__.__name__}()"


def _donothing_func(*args, **kwargs):
    return None


try:  # pragma: no cover - duecredit not installed in this image
    from duecredit import due, Doi, BibTeX  # type: ignore # noqa: F401
except ImportError:
    due = _InactiveDueCreditCollector()
    Doi = _donothing_func
    BibTeX = _donothing_func
