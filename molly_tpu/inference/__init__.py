from .engine import GenerationConfig, generate
from .sampling import sample_tokens, top_k_filter, top_p_filter
from .server import Request, ServingEngine
from .speculative import generate_lookup, generate_speculative
