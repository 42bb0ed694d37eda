from .observability import (KernelStats, kernel_stats, profile_trace,
                            spy_matrix, Timer)
