from dnsjax.viz.panels import residual_panel  # noqa: F401
