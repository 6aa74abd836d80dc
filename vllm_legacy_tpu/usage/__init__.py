from vllm_legacy_tpu.usage.usage_lib import (UsageContext, UsageMessage,
                                             is_usage_stats_enabled,
                                             usage_message)

__all__ = ["UsageContext", "UsageMessage", "is_usage_stats_enabled",
           "usage_message"]
