from .lstm_lm import (LMConfig, forward_seq, forward_step, init_params,
                      zero_carry)

__all__ = ['LMConfig', 'forward_seq', 'forward_step', 'init_params',
           'zero_carry']
