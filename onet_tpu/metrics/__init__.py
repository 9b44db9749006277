from onet_tpu.metrics.segmentation import (
    accuracy,
    miou,
    target_iou,
    detection_rate,
    false_alarm_rate,
    evaluate_binary_segmentation,
    align_labels_by_accuracy,
    align_labels_hungarian,
    psnr_snr,
)
