from . import data_tools
from .data_tools import (
    balanced_subsample,
    check_data_leak,
    convert_inference_jsonl,
    dataset_stats,
    filter_by_markers,
    jsonl_to_parquet,
    merge_parquets,
    records_to_parquet,
    replace_reserved_tokens,
    split_by_task,
    validate_tagged_sequences,
)
from .llm_judge import judge_records, parse_verdict, strip_think
