from .accuracy import (confusion_matrix, mean_average_precision,
                       mean_class_accuracy, mean_iou, top_k_accuracy)
from .proposal import (average_recall_at_avg_proposals,
                       get_weighted_score, pairwise_temporal_iou)
from .davis import (aggregate_metrics, db_eval_boundary, db_eval_iou,
                    db_statistics, evaluate_semisupervised, f_measure_frame,
                    seg2bmap)

__all__ = [
    'confusion_matrix', 'average_recall_at_avg_proposals', 'get_weighted_score', 'pairwise_temporal_iou', 'mean_average_precision', 'mean_class_accuracy',
    'mean_iou', 'top_k_accuracy', 'aggregate_metrics', 'db_eval_boundary',
    'db_eval_iou', 'db_statistics', 'evaluate_semisupervised',
    'f_measure_frame', 'seg2bmap'
]
