from .evaluator import BaseEvaluator
