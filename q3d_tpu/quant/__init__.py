from .tensor_quant import QuantSpec, TensorQuantizer, fake_quant  # noqa: F401
from .rules import (QuantRules, LayerRule, quant_rules_scope,  # noqa: F401
                    get_active_rules, set_active_rules)
