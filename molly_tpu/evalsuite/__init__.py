from .harness import evaluate_file, evaluate_task, group_entries, load_entries
from .registry import TASK_REGISTRY, get_base_task_name
from . import metrics
