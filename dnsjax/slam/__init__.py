from dnsjax.slam.keyframes import KeyframeStore  # noqa: F401
