from .evaluation import UnstructuredCase, evaluate_bundle, EvalReport
