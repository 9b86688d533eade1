from densereg_tpu.ops.meanshift_pallas import weighted_mean_shift_pallas

__all__ = ["weighted_mean_shift_pallas"]
