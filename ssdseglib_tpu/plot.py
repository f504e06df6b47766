"""Plot helpers — mirror of reference plot.py (move_figure, plot.py:3-25)."""

from __future__ import annotations


def move_figure(figure, x: int, y: int) -> None:
    """Move a matplotlib figure window to (x, y), per-backend."""
    import matplotlib

    backend = matplotlib.get_backend().lower()
    manager = figure.canvas.manager
    try:
        if "tkagg" in backend:
            manager.window.wm_geometry(f"+{x}+{y}")
        elif "wxagg" in backend:
            manager.window.SetPosition((x, y))
        elif "qt" in backend:
            manager.window.move(x, y)
    except Exception:
        # headless backends (Agg) have no movable window — silently skip
        pass
