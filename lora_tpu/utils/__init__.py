from .eval import (  # noqa: F401
    EXAMPLE_PROMPTS,
    evaluate_pipe,
    image_grid,
    text_img_alignment,
    visualize_progress,
)
from .metrics import MetricsLogger, StepTimer  # noqa: F401
