from .logging import MetricsWriter
